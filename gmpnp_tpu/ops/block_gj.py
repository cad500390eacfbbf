"""Pallas kernel: batched small-block Gauss-Jordan inverse.

Inverts (N, f, f) field-coupling blocks (f <= 16) — the operation behind
every block-Jacobi / block-SSOR preconditioner application and the
cyclic-reduction levels, executed once per Newton iteration.  The kernel
tiles N and performs the fully-unrolled pivoted elimination on values held
in VMEM, avoiding the ~2f intermediate (N, f, 2f) HBM round-trips the XLA
graph of the pure-jnp version can materialize.

The elimination body is shared with solve/smallblock.py (single source of
truth); the kernel wraps it per tile.
"""

from __future__ import annotations

import contextlib

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gmpnp_tpu.solve.smallblock import block_inv


def _tile_kernel(x_ref, o_ref):
    o_ref[:] = block_inv(x_ref[:])


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def block_inv_pallas(A: jnp.ndarray, tile: int = 256,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched inverse of (N, f, f) via a tiled Pallas kernel.

    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend; used by tests and as the safe default off-TPU).
    """
    N, f, _ = A.shape
    pad = (-N) % tile
    if pad:
        eye = jnp.broadcast_to(jnp.eye(f, dtype=A.dtype), (pad, f, f))
        A = jnp.concatenate([A, eye], axis=0)
    Np = A.shape[0]

    # x64 disabled during tracing: i64 grid index maps fail Mosaic
    # legalization (see ops.ell_spmv).  f64 inputs (the CPU/interpreter
    # use) keep their dtype — x64 disabling only affects new literals,
    # and the kernel body is dtype-polymorphic.
    with (contextlib.nullcontext() if interpret
          else jax.enable_x64(False)):
        out = pl.pallas_call(
            _tile_kernel,
            out_shape=jax.ShapeDtypeStruct((Np, f, f), A.dtype),
            grid=(Np // tile,),
            in_specs=[pl.BlockSpec((tile, f, f), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((tile, f, f), lambda i: (i, 0, 0)),
            interpret=interpret,
        )(A)
    return out[:N]
