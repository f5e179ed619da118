"""R-hat / ESS sanity and calibration."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu.infer.diagnostics import (
    effective_sample_size,
    gelman_rubin,
    summarize,
)


def test_rhat_iid_near_one():
    x = jax.random.normal(jax.random.PRNGKey(0), (500, 8, 3))
    r = gelman_rubin(x)
    assert r.shape == (3,)
    assert jnp.all(r < 1.02)


def test_rhat_detects_disagreement():
    x = jax.random.normal(jax.random.PRNGKey(1), (500, 4))
    x = x + jnp.array([0.0, 0.0, 5.0, 5.0])[None, :]
    r = gelman_rubin(x[:, :, None])
    assert float(r[0]) > 2.0


def test_rhat_detects_trend():
    """Split-R̂ catches a within-chain trend even with identical chains."""
    trend = jnp.linspace(0, 5, 600)[:, None]
    x = trend + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (600, 4))
    r = gelman_rubin(x[:, :, None])
    assert float(r[0]) > 1.5


def test_ess_iid_close_to_n():
    n, m = 1000, 8
    x = jax.random.normal(jax.random.PRNGKey(3), (n, m, 2))
    ess = effective_sample_size(x)
    assert ess.shape == (2,)
    assert jnp.all(ess > 0.6 * n * m)
    assert jnp.all(ess < 1.6 * n * m)


def test_ess_ar1_matches_theory():
    """AR(1) with coefficient φ has ESS ≈ N (1-φ)/(1+φ)."""
    phi, n, m = 0.9, 4000, 4
    key = jax.random.PRNGKey(4)
    eps = jax.random.normal(key, (n, m))

    def step(carry, e):
        nxt = phi * carry + jnp.sqrt(1 - phi**2) * e
        return nxt, nxt

    _, x = jax.lax.scan(step, jnp.zeros(m), eps)
    ess = effective_sample_size(x[:, :, None])
    want = n * m * (1 - phi) / (1 + phi)
    assert 0.5 * want < float(ess[0]) < 2.0 * want


def test_summarize_keys():
    x = jax.random.normal(jax.random.PRNGKey(5), (200, 4, 3))
    s = summarize(x)
    for key in ("mean", "std", "median", "5.0%", "95.0%", "n_eff", "r_hat"):
        assert s[key].shape == (3,)
