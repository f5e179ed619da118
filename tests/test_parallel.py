"""Sharded execution on the 8-device virtual CPU mesh: correctness of the
chain-sharded runner and of the psum-based cross-chain diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu import arwmh, asss, models, run_mcmc
from adaptive_mcmc_tpu.infer.diagnostics import gelman_rubin
from adaptive_mcmc_tpu.parallel import (
    chain_mesh,
    cross_chain_moments,
    run_mcmc_sharded,
    sharded_gelman_rubin,
)


def test_mesh_has_8_devices():
    mesh = chain_mesh()
    assert mesh.devices.size == 8


def test_sharded_run_matches_unsharded():
    """Same kernel, same key: sharding the chain axis must not change the
    numerics (chains are independent)."""
    t = models.std_normal(3)
    k = arwmh(t)
    s_ref, _, _ = run_mcmc(
        k, jax.random.PRNGKey(0), num_warmup=5, num_samples=20, n_chains=16
    )
    s_shard, _, _ = run_mcmc_sharded(
        k, jax.random.PRNGKey(0), num_warmup=5, num_samples=20, n_chains=16
    )
    np.testing.assert_allclose(
        np.asarray(s_ref), np.asarray(s_shard), rtol=1e-5, atol=1e-6
    )


def test_sharded_run_asss():
    t = models.eight_schools_noncentered()
    k = asss(t)
    samples, extras, last = run_mcmc_sharded(
        k, jax.random.PRNGKey(1), num_warmup=10, num_samples=40,
        thinning=2, n_chains=8, extra_fields=("potential_energy",),
    )
    assert samples.shape == (20, 8, 10)
    assert np.isfinite(np.asarray(samples)).all()
    assert extras["potential_energy"].shape == (20, 8)


def test_cross_chain_moments_psum():
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 5)) * 2.0 + 1.0
    mean, var = cross_chain_moments(x)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(jnp.mean(x, 0)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(jnp.var(x, 0)),
                               rtol=1e-4, atol=1e-4)


def test_sharded_rhat_matches_local():
    x = jax.random.normal(jax.random.PRNGKey(3), (200, 16, 3))
    got = sharded_gelman_rubin(x)
    want = gelman_rubin(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
