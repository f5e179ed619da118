"""Pallas TPU kernels, exercised in interpret mode on CPU (compiled-mode
parity with the scan implementation is checked on real TPU hardware — it
was bit-exact at 4096x10 when measured)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_mcmc_tpu.ops.cholesky import rank1_cholesky_update
from adaptive_mcmc_tpu.ops.pallas.chol_update import chol_update_pallas


def _rand_chols(key, C, d):
    a = jax.random.normal(key, (C, d, d)) * 0.4
    cov = jnp.einsum("cij,ckj->cik", a, a) + jnp.eye(d)
    return jnp.linalg.cholesky(cov)


@pytest.mark.parametrize("C,d", [(4, 3), (130, 10), (300, 26), (128, 1)])
def test_pallas_matches_scan(C, d):
    key = jax.random.PRNGKey(0)
    L = _rand_chols(key, C, d)
    v = jax.random.normal(jax.random.PRNGKey(1), (C, d))
    coef = jnp.linspace(0.01, 0.9, C)
    got = chol_update_pallas(L, v, coef, interpret=True)
    want = jax.vmap(rank1_cholesky_update)(L, v, coef)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # strictly lower triangular with positive diagonal
    np.testing.assert_allclose(got, jnp.tril(got), atol=0.0)
    assert bool((jax.vmap(jnp.diagonal)(got) > 0).all())


def test_pallas_padding_path():
    """C not a multiple of the lane tile exercises the pad/slice path."""
    C, d = 37, 5
    key = jax.random.PRNGKey(2)
    L = _rand_chols(key, C, d)
    v = jax.random.normal(jax.random.PRNGKey(3), (C, d))
    coef = jnp.full((C,), 0.3)
    got = chol_update_pallas(L, v, coef, interpret=True)
    assert got.shape == (C, d, d)
    want = jax.vmap(rank1_cholesky_update)(L, v, coef)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_downdate_nan_matches_reference_guard():
    """A downdate that destroys positive-definiteness must yield NaNs in
    BOTH implementations (the caller's NaN guard relies on it)."""
    d = 4
    L = jnp.broadcast_to(jnp.eye(d), (128, d, d)) + 0.0
    v = jnp.zeros((128, d)).at[:, 0].set(10.0)
    coef = jnp.full((128,), -1.0)  # I - 100 e0 e0^T: indefinite
    got = chol_update_pallas(L, v, coef, interpret=True)
    want = jax.vmap(rank1_cholesky_update)(L, v, coef)
    assert bool(jnp.isnan(got).any())
    assert bool(jnp.isnan(want).any())
