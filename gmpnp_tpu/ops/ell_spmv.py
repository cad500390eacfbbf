"""Pallas kernel: block-ELL matvec contraction.

Computes y[n] = sum_k blocks[n, k] @ xg[n, k]  where xg = x[adj] has been
gathered by XLA (TPU gathers are best left to XLA; the win here is fusing
the K-slot block-matvec reduction inside one VMEM tile instead of an
(N, K, f) intermediate).  This is the inner operation of every Krylov
iteration on the 3D models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _contract_kernel(K, f, blocks_ref, xg_ref, y_ref):
    # blocks: (T, K*f, f), xg: (T, K*f) -> y: (T, f).  The contraction is
    # written as a static K-loop of <=3D broadcast-multiply + last-axis
    # sums: Mosaic's tpu.matmul rejects tiny batched contractions ("lhs
    # contracting dims must be of size 1"), its layout passes are only
    # robust for <= 3 dims (4D block shapes crashed the remote compiler),
    # and for f <= 9 this is pure VPU work anyway.
    acc = jnp.zeros(y_ref.shape, blocks_ref.dtype)
    for k in range(K):
        bk = blocks_ref[:, k * f:(k + 1) * f, :]     # (T, f, f)
        xk = xg_ref[:, k * f:(k + 1) * f]            # (T, f)
        acc = acc + jnp.sum(bk * xk[:, None, :], axis=-1)
    y_ref[:] = acc.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def ell_block_contract_pallas(blocks: jnp.ndarray, xg: jnp.ndarray,
                              tile: int = 128,
                              interpret: bool = False) -> jnp.ndarray:
    """(N, K, f, f) x (N, K, f) -> (N, f) with the K reduction fused."""
    N, K, f, _ = blocks.shape
    pad = (-N) % tile
    if pad:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad, K, f, f), blocks.dtype)], axis=0)
        xg = jnp.concatenate([xg, jnp.zeros((pad, K, f), xg.dtype)], axis=0)
    Np = blocks.shape[0]
    blocks3 = blocks.reshape(Np, K * f, f)
    xg2 = xg.reshape(Np, K * f)

    y = pl.pallas_call(
        functools.partial(_contract_kernel, K, f),
        out_shape=jax.ShapeDtypeStruct((Np, f), blocks.dtype),
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((tile, K * f, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, K * f), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, f), lambda i: (i, 0)),
        interpret=interpret,
    )(blocks3, xg2)
    return y[:N]
