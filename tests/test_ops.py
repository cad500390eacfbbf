"""Pallas kernels (interpreter mode) vs the reference jnp implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from gmpnp_tpu.ops import ell_block_contract_pallas


@pytest.mark.parametrize("N,K,f", [(50, 4, 3), (200, 16, 9)])
def test_ell_contract_pallas_matches(N, K, f):
    rng = np.random.default_rng(N + K + f)
    blocks = jnp.asarray(rng.normal(size=(N, K, f, f)))
    xg = jnp.asarray(rng.normal(size=(N, K, f)))
    got = np.asarray(ell_block_contract_pallas(blocks, xg, tile=64,
                                               interpret=True))
    ref = np.einsum("nkfg,nkg->nf", np.asarray(blocks), np.asarray(xg))
    np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-11)


def test_ell_matvec_pallas_matches_blockell():
    """ops.ell_matvec_pallas (the production hook for the f32 Krylov
    path, LinearConfig.matvec='pallas') equals BlockELL.matvec."""
    from gmpnp_tpu.fem import FemSpace
    from gmpnp_tpu.mesh import cylinder_mesh, pore_boundary_markers
    from gmpnp_tpu.fem.assembly import BlockELL
    from gmpnp_tpu.ops.ell_spmv import ell_matvec_pallas

    mesh = cylinder_mesh(100e-9, 10e-9, n_rings=2, n_layers=8)
    mesh = pore_boundary_markers(mesh, 100e-9, 10e-9)
    space = FemSpace.build(mesh, 3, quad_degree=2)
    rng = np.random.default_rng(11)
    adj = np.asarray(space.adj)
    N, K = adj.shape
    blocks = rng.normal(size=(N, K, 3, 3)).astype(np.float32)
    ell = BlockELL.from_blocks(jnp.asarray(adj), jnp.asarray(blocks),
                               jnp.asarray(np.asarray(space.diag_slot)))
    x = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    got = np.asarray(ell_matvec_pallas(ell, x, interpret=True))
    ref = np.asarray(ell.matvec(x))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_gmres_with_pallas_matvec_matches_xla():
    """f32 GMRES using ops.ell_matvec_pallas as the operator converges to
    the same solution as with BlockELL.matvec (the production wiring for
    LinearConfig.matvec='pallas')."""
    from gmpnp_tpu.fem import FemSpace
    from gmpnp_tpu.mesh import cylinder_mesh, pore_boundary_markers
    from gmpnp_tpu.fem.assembly import BlockELL
    from gmpnp_tpu.ops.ell_spmv import ell_matvec_pallas
    from gmpnp_tpu.solve.linear import gmres

    mesh = cylinder_mesh(100e-9, 10e-9, n_rings=2, n_layers=8)
    mesh = pore_boundary_markers(mesh, 100e-9, 10e-9)
    space = FemSpace.build(mesh, 3, quad_degree=2)
    rng = np.random.default_rng(13)
    adj = np.asarray(space.adj)
    N, K = adj.shape
    blocks = (rng.normal(size=(N, K, 3, 3)) * 0.05).astype(np.float32)
    dslot = np.asarray(space.diag_slot)
    blocks[np.arange(N), dslot] += 2.0 * np.eye(3, dtype=np.float32)
    ell = BlockELL.from_blocks(jnp.asarray(adj), jnp.asarray(blocks),
                               jnp.asarray(dslot))
    b = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))

    res_x = gmres(ell.matvec, b, tol=1e-6, maxiter=200)
    res_p = gmres(lambda x: ell_matvec_pallas(ell, x, interpret=True), b,
                  tol=1e-6, maxiter=200)
    assert bool(res_x.converged) and bool(res_p.converged)
    np.testing.assert_allclose(np.asarray(res_p.x), np.asarray(res_x.x),
                               rtol=5e-4, atol=5e-6)
