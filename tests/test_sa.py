"""SA (sample-adaptive) kernel: ensemble invariants and posterior
correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu import SAConfig, models, run_mcmc, sa


def test_ensemble_stats_track_set():
    """loc/scale in the adapt state remain the mean/chol-cov of the
    ensemble through incremental updates."""
    t = models.std_normal(3)
    k = sa(t, SAConfig(adapt_state_size=24))
    st = k.init(jax.random.PRNGKey(0), n_chains=2)
    for _ in range(30):
        st = k.step(st)
    zs = st.adapt_state.zs  # (2, N, d)
    loc_want = jnp.mean(zs, axis=1)
    np.testing.assert_allclose(
        st.adapt_state.loc, loc_want, rtol=1e-3, atol=1e-3
    )
    for c in range(2):
        centered = zs[c] - loc_want[c]
        cov_want = centered.T @ centered / zs.shape[1]
        got = st.adapt_state.scale[c] @ st.adapt_state.scale[c].T
        np.testing.assert_allclose(got, cov_want, rtol=0.05, atol=5e-3)


def test_sample_is_ensemble_member():
    t = models.std_normal(2)
    k = sa(t, SAConfig(adapt_state_size=16))
    st = k.init(jax.random.PRNGKey(1), n_chains=3)
    st = k.step(st)
    for c in range(3):
        dists = jnp.linalg.norm(
            st.adapt_state.zs[c] - st.position[c][None, :], axis=1
        )
        assert float(jnp.min(dists)) < 1e-6


def test_posterior_moments_std_normal():
    t = models.std_normal(2)
    k = sa(t, SAConfig())
    samples, _, last = run_mcmc(
        k, jax.random.PRNGKey(2), num_warmup=2000, num_samples=4000,
        n_chains=8,
    )
    flat = samples.reshape(-1, 2)
    np.testing.assert_allclose(jnp.mean(flat, 0), jnp.zeros(2), atol=0.12)
    np.testing.assert_allclose(jnp.std(flat, 0), jnp.ones(2), atol=0.12)
    # a well-adapted SA proposal on a Gaussian accepts nearly always
    assert 0.02 < float(jnp.mean(last.mean_accept_prob)) <= 1.0


def test_diag_mass_variant():
    t = models.std_normal(3)
    k = sa(t, SAConfig(dense_mass=False, adapt_state_size=32))
    samples, _, _ = run_mcmc(
        k, jax.random.PRNGKey(3), num_warmup=1000, num_samples=2000,
        n_chains=8,
    )
    flat = samples.reshape(-1, 3)
    np.testing.assert_allclose(jnp.mean(flat, 0), jnp.zeros(3), atol=0.15)
    np.testing.assert_allclose(jnp.std(flat, 0), jnp.ones(3), atol=0.15)


def test_eight_schools_finite():
    t = models.eight_schools_noncentered()
    k = sa(t)
    samples, _, _ = run_mcmc(
        k, jax.random.PRNGKey(4), num_warmup=500, num_samples=500,
        n_chains=4,
    )
    assert np.isfinite(np.asarray(samples)).all()


def test_eight_schools_posterior_moments():
    """SA quality on the real benchmark target: posterior means must hit
    the 2-D quadrature truths (E[mu]=4.397, E[log tau]=0.8022 —
    experiments/quadrature.py; same anchors as the NUTS test).  A pooled
    16-chain x 2.5k-draw run has MC s.e. ~0.03 on mu; tolerances are set
    ~5x that to stay flake-free while still catching bias at the level
    the w_eval sweep would care about."""
    t = models.eight_schools_noncentered()
    k = sa(t)
    samples, _, _ = run_mcmc(
        k, jax.random.PRNGKey(5), num_warmup=2500, num_samples=25_000,
        thinning=10, n_chains=16,
    )
    s = np.asarray(samples).reshape(-1, t.dim)
    assert abs(s[:, 0].mean() - 4.397) < 0.2, s[:, 0].mean()
    assert abs(s[:, 1].mean() - 0.8022) < 0.15, s[:, 1].mean()
