"""Pallas kernels (interpreter mode) vs the reference jnp implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from gmpnp_tpu.ops import block_inv_pallas, ell_block_contract_pallas
from gmpnp_tpu.solve.smallblock import block_inv


@pytest.mark.parametrize("N,f", [(10, 3), (300, 9), (257, 7)])
def test_block_inv_pallas_matches(N, f):
    rng = np.random.default_rng(N + f)
    A = rng.normal(size=(N, f, f)) + 3 * np.eye(f)
    got = np.asarray(block_inv_pallas(jnp.asarray(A), tile=64,
                                      interpret=True))
    ref = np.asarray(block_inv(jnp.asarray(A)))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("N,K,f", [(50, 4, 3), (200, 16, 9)])
def test_ell_contract_pallas_matches(N, K, f):
    rng = np.random.default_rng(N + K + f)
    blocks = jnp.asarray(rng.normal(size=(N, K, f, f)))
    xg = jnp.asarray(rng.normal(size=(N, K, f)))
    got = np.asarray(ell_block_contract_pallas(blocks, xg, tile=64,
                                               interpret=True))
    ref = np.einsum("nkfg,nkg->nf", np.asarray(blocks), np.asarray(xg))
    np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-11)
