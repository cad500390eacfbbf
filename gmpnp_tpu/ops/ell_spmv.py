"""Pallas kernel: block-ELL matvec contraction.

Computes y[n] = sum_k blocks[n, k] @ xg[n, k]  where xg = x[adj] has been
gathered by XLA (TPU gathers are best left to XLA; the win here is fusing
the K-slot block-matvec reduction inside one VMEM tile instead of an
(N, K, f) intermediate).  This is the inner operation of every Krylov
iteration on the 3D models (f32 solve_dtype path; Pallas TPU has no f64).

Hardware-validated formulation (2026-08-17, tunneled v5e): the kernel
body stays TINY and the grid does the K reduction — one (tile, f, f)
multiply+sum per grid step, accumulated into the revisited output block.
Two hard-won portability rules:
  - under jax_enable_x64 (the framework default) grid index maps trace
    to i64 and Mosaic fails legalization ("func.return ... i64") or the
    AOT helper crashes outright — the pallas_call must be traced with
    x64 disabled (all operands here are f32 anyway);
  - the LAST TWO dims of every block shape must be (divisible by 8,
    divisible by 128) or equal to the array dims — hence the K-major
    layout with leading (1,) block dims.
In-kernel einsum is additionally rejected by tpu.matmul ("lhs
contracting dims must be of size 1") — hence broadcast-multiply + sum.
"""

from __future__ import annotations

import contextlib

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _acc_kernel(b_ref, x_ref, y_ref):
    # grid step (i, k): b: (1, T, f, f) slot-k blocks; x: (1, T, f);
    # y: (T, f) accumulated across the sequentially-revisited k axis.
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    b = b_ref[0]                    # (T, f, f)
    x = x_ref[0]                    # (T, f)
    y_ref[:] += jnp.sum(b * x[:, None, :], axis=-1)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def ell_block_contract_pallas(blocks: jnp.ndarray, xg: jnp.ndarray,
                              tile: int = 512,
                              interpret: bool = False) -> jnp.ndarray:
    """(N, K, f, f) x (N, K, f) -> (N, f) with the K reduction on the grid."""
    N, K, f, _ = blocks.shape
    pad = (-N) % tile
    if pad:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad, K, f, f), blocks.dtype)], axis=0)
        xg = jnp.concatenate([xg, jnp.zeros((pad, K, f), xg.dtype)], axis=0)
    Np = blocks.shape[0]
    bt = blocks.transpose(1, 0, 2, 3)       # (K, Np, f, f)
    xt = xg.transpose(1, 0, 2)              # (K, Np, f)

    # Trace the kernel with x64 disabled: under jax_enable_x64 (the
    # framework default) the grid index maps trace to i64, and Mosaic
    # fails to legalize the i64 func.return of the index computation.
    # All operands here are f32, so the setting changes nothing else.
    with (contextlib.nullcontext() if interpret
          else jax.enable_x64(False)):
        y = pl.pallas_call(
            _acc_kernel,
            out_shape=jax.ShapeDtypeStruct((Np, f), blocks.dtype),
            grid=(Np // tile, K),
            in_specs=[
                pl.BlockSpec((1, tile, f, f), lambda i, k: (k, i, 0, 0)),
                pl.BlockSpec((1, tile, f), lambda i, k: (k, i, 0)),
            ],
            out_specs=pl.BlockSpec((tile, f), lambda i, k: (i, 0)),
            interpret=interpret,
        )(bt, xt)
    return y[:N]


def ell_matvec_pallas(ell, x: jnp.ndarray,
                      interpret: bool = None) -> jnp.ndarray:
    """Drop-in for BlockELL.matvec with the contraction in Pallas.

    The neighbor gather stays in XLA; only the (N, K, f, f) x (N, K, f)
    reduction runs in the kernel.  f32-only on hardware (Pallas TPU has
    no f64) — used by the solve_dtype='f32' Krylov path via
    LinearConfig.matvec='pallas'.

    Backend dispatch happens at LOWERING time via ``lax.platform_dependent``
    (not ``jax.default_backend()``, which reflects the process default: on
    a TPU host tracing for the CPU backend — e.g. bench.py's same-program
    CPU baseline — would wrongly emit a Mosaic kernel for CPU).  Non-TPU
    lowerings take the mathematically identical XLA contraction.
    """
    N, K, f, _ = ell.shape4
    xg = x[ell.adj]                                   # (N, K, f)
    blocks = ell.blocks4()
    if interpret is True:
        return ell_block_contract_pallas(blocks, xg, interpret=True)
    return ell_contract_dispatch(blocks, xg)


def ell_contract_dispatch(blocks: jnp.ndarray, xg: jnp.ndarray,
                          interpret: bool = None) -> jnp.ndarray:
    """Backend-dispatched block-ELL contraction on PRE-GATHERED operands:
    ``(N, K, f, f) x (N, K, f) -> (N, f)``.

    Taking ``blocks`` (rather than a BlockELL) lets callers hoist the
    (N, f, K*f) -> (N, K, f, f) relayout out of a Krylov loop — the
    carried-mode f32 chord solve (solve.slab.slab_apply_f32) casts and
    relayouts the stale equilibrated matrix once per time step and runs
    only gather + contract per GMRES iteration.

    TPU lowers to the hardware-validated Pallas kernel (full-f32 VPU
    multiply+sum — NOT a default-precision dot, which runs bf16-grade
    passes on the MXU, docs/TPU_NOTES.md); other backends take the
    mathematically identical full-precision einsum.
    """
    if interpret is True:
        return ell_block_contract_pallas(blocks, xg, interpret=True)
    return jax.lax.platform_dependent(
        blocks, xg,
        tpu=lambda b, g: ell_block_contract_pallas(b, g, interpret=False),
        # the fused einsum is fine off-TPU (the TPU VMEM-overflow fault
        # that motivated this kernel is TPU-specific, docs/TPU_NOTES.md);
        # HIGHEST precision keeps the f32 contraction full-precision on
        # backends that would otherwise split into bf16-grade passes
        default=lambda b, g: jnp.einsum("nkfg,nkg->nf", b, g,
                                        precision=jax.lax.Precision.HIGHEST),
    )
