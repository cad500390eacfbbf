"""Pallas TPU kernels for the hot per-iteration primitives.

Status: kernels are correctness-validated in Pallas interpreter mode on any
backend (tests/test_ops.py) and are opt-in on hardware
(``LinearConfig``-level wiring lands once the target toolchain compiles
Mosaic f64 kernels; the tunneled dev TPU's remote-compile path currently
makes Pallas iteration impractical — see ops/README notes in each module).

Kernels:
- block_gj: fused batched small-block Gauss-Jordan inverse (the per-Newton
  block-Jacobi/SSOR factorization) — keeps the augmented system in VMEM
  registers instead of materializing ~2f intermediate HBM buffers.
- ell_spmv: block-ELL matvec contraction with the K-slot reduction fused in
  VMEM tiles.
"""

from gmpnp_tpu.ops.block_gj import block_inv_pallas
from gmpnp_tpu.ops.ell_spmv import ell_block_contract_pallas

__all__ = ["block_inv_pallas", "ell_block_contract_pallas"]
