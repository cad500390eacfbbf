"""Pallas TPU kernels for the hot per-iteration primitives.

Kernels:
- ell_spmv: block-ELL matvec contraction with the K-slot reduction fused
  in VMEM tiles.  Compiles and runs on TPU hardware (x64-free tracing +
  grid-based reduction, docs/TPU_NOTES.md round 2) and is wired into the
  production f32 Krylov path as ``LinearConfig.matvec='pallas'``.

A batched small-block Gauss-Jordan inverse kernel (block_gj) shipped in
rounds 1-3 in interpreter mode only — its fully-unrolled elimination
crashed the vendored Mosaic compiler, and the round-3 speed-of-light
accounting (docs/TPU_NOTES.md "carried-mode cost accounting") showed the
banded factor/solve path is HBM-latency-bound with nothing for a Pallas
rewrite to win.  Removed in round 4 (VERDICT r3 item 7): a kernel that
cannot compile on the only target hardware is inventory, not capability;
the XLA segment-sum/batched-LU formulation it was meant to replace IS the
production path.
"""

from gmpnp_tpu.ops.ell_spmv import ell_block_contract_pallas

__all__ = ["ell_block_contract_pallas"]
