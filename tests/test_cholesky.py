"""Rank-1 Cholesky update: parity with dense re-factorization.

The adaptation-recursion semantics (arwmh.py:188-191) are the stated
numerical-parity north star — these tests pin them down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_mcmc_tpu.ops.cholesky import (
    adaptive_scale_update,
    rank1_cholesky_update,
    rank1_cholesky_update_batched,
)


def random_chol(key, d, scale=1.0):
    a = jax.random.normal(key, (d, d)) * scale
    cov = a @ a.T + 0.5 * jnp.eye(d)
    return jnp.linalg.cholesky(cov)


@pytest.mark.parametrize("d", [1, 2, 5, 10, 26])
def test_update_matches_dense(d):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    L = random_chol(k1, d)
    v = jax.random.normal(k2, (d,))
    for coef in [1.0, 0.3, 0.01]:
        got = rank1_cholesky_update(L, v, coef)
        want = jnp.linalg.cholesky(L @ L.T + coef * jnp.outer(v, v))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
        # lower-triangular with positive diagonal
        np.testing.assert_allclose(got, jnp.tril(got), atol=1e-7)
        assert (jnp.diagonal(got) > 0).all()


def test_update_jits_and_vmaps():
    d, C = 7, 16
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, C)
    Ls = jnp.stack([random_chol(k, d) for k in ks])
    vs = jax.random.normal(key, (C, d))
    coefs = jnp.linspace(0.01, 0.9, C)
    got = jax.jit(rank1_cholesky_update_batched)(Ls, vs, coefs)
    want = jnp.stack(
        [
            jnp.linalg.cholesky(Ls[i] @ Ls[i].T + coefs[i] * jnp.outer(vs[i], vs[i]))
            for i in range(C)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_adaptive_scale_update_recursion():
    """L' = chol((1-γ) L Lᵀ + γ δδᵀ) — the exact reference recursion."""
    d = 10
    key = jax.random.PRNGKey(2)
    L = random_chol(key, d)
    delta = jax.random.normal(jax.random.PRNGKey(3), (d,))
    for gamma in [0.9, 0.5, 0.05, 1e-3]:
        got = adaptive_scale_update(L, delta, gamma)
        want = jnp.linalg.cholesky(
            (1 - gamma) * L @ L.T + gamma * jnp.outer(delta, delta)
        )
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_nan_guard_keeps_old_factor():
    """γ=1 makes the updated matrix rank-1 (singular) -> NaN -> keep old L,
    mirroring arwmh.py:190-191."""
    d = 4
    L = jnp.eye(d)
    delta = jnp.zeros(d).at[0].set(1.0)
    out = adaptive_scale_update(L, delta, 1.0)
    assert not jnp.any(jnp.isnan(out))
    np.testing.assert_allclose(out, L)

    # batched guard is per-chain
    Ls = jnp.stack([L, L])
    deltas = jnp.stack([delta, delta])
    gammas = jnp.array([1.0, 0.5])
    outs = adaptive_scale_update(Ls, deltas, gammas)
    np.testing.assert_allclose(outs[0], L)
    want1 = jnp.linalg.cholesky(0.5 * jnp.eye(d) + 0.5 * jnp.outer(delta, delta))
    np.testing.assert_allclose(outs[1], want1, rtol=1e-5, atol=1e-6)


def test_long_recursion_stays_consistent():
    """1000 adaptation steps track the dense covariance recursion."""
    d = 5
    key = jax.random.PRNGKey(4)
    L = jnp.eye(d)
    cov = jnp.eye(d)
    for i in range(1, 1001):
        key, sub = jax.random.split(key)
        delta = jax.random.normal(sub, (d,))
        gamma = float(i) ** (-2.0 / 3.0)
        L = adaptive_scale_update(L, delta, gamma)
        cov = (1 - gamma) * cov + gamma * jnp.outer(delta, delta)
    np.testing.assert_allclose(L @ L.T, cov, rtol=2e-3, atol=2e-3)
