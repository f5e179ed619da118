"""Driver semantics: shapes, thinning, extra fields, sample_pnx,
log-scale collection, MCMC convenience API."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu import (
    MCMC,
    arwmh,
    asss,
    collect_states_logscale,
    get_init_adapt_state,
    models,
    ns_logscale,
    run_mcmc,
    sample_pnx,
)


def test_run_mcmc_shapes_and_thinning():
    t = models.std_normal(3)
    k = arwmh(t)
    samples, extras, last = run_mcmc(
        k,
        jax.random.PRNGKey(0),
        num_warmup=10,
        num_samples=40,
        thinning=4,
        n_chains=5,
        extra_fields=("potential_energy", "as_change"),
    )
    assert samples.shape == (10, 5, 3)
    assert extras["potential_energy"].shape == (10, 5)
    assert extras["as_change"].shape == (10, 5)
    assert int(last.i) == 50


def test_thinning_consistency():
    """thinning=k collects every k-th state of the thinning=1 stream."""
    t = models.std_normal(2)
    k = arwmh(t)
    s1, _, _ = run_mcmc(
        k, jax.random.PRNGKey(1), num_warmup=0, num_samples=12, n_chains=2
    )
    s3, _, _ = run_mcmc(
        k, jax.random.PRNGKey(1), num_warmup=0, num_samples=12, thinning=3,
        n_chains=2,
    )
    np.testing.assert_allclose(s1[2::3], s3, rtol=1e-6)


def test_mcmc_class_api():
    t = models.eight_schools_noncentered()
    mcmc = MCMC(arwmh(t), num_warmup=200, num_samples=400, thinning=2,
                n_chains=4)
    mcmc.run(jax.random.PRNGKey(2), extra_fields=("potential_energy",))
    sites = mcmc.get_samples()
    assert set(sites) == {"mu", "tau", "theta_base"}
    assert sites["mu"].shape == (800,)
    assert sites["theta_base"].shape == (800, 8)
    assert jnp.all(sites["tau"] > 0)
    # warmup clock was propagated into the kernel config
    assert mcmc.kernel.config.num_warmup == 200
    assert "Acceptance rate" in mcmc.diagnostics_str()
    mcmc.print_summary()


def test_sample_pnx_shapes_and_spread():
    t = models.std_normal(2)
    k = arwmh(t)
    adapt = get_init_adapt_state(k, jax.random.PRNGKey(3),
                                 position=jnp.zeros(2))
    x = jnp.array([[0.0, 0.0], [3.0, 0.0], [0.0, -3.0]])
    out = sample_pnx(k, jax.random.PRNGKey(4), x, adapt, n=5, n_samples=64)
    assert out.shape == (3, 64, 2)
    # chains started at distinct points remain centered near them after a
    # few RWM steps but with nonzero spread
    spread = jnp.std(out, axis=1)
    assert float(jnp.min(spread)) > 0.0


def test_sample_pnx_asss():
    t = models.std_normal(2)
    k = asss(t)
    adapt = get_init_adapt_state(k, jax.random.PRNGKey(5),
                                 position=jnp.zeros(2))
    x = jnp.zeros((2, 2))
    out = sample_pnx(k, jax.random.PRNGKey(6), x, adapt, n=3, n_samples=32)
    assert out.shape == (2, 32, 2)
    assert jnp.all(jnp.isfinite(out))


def test_ns_logscale_grid():
    ns = ns_logscale(3)
    assert int(ns[0]) == 1
    assert int(ns[-1]) == 1000
    # decades 0-2 are dense, decade 3 thinned by 10
    assert (np.diff(np.asarray(ns[:100])) == 1).all()


def test_collect_states_logscale():
    t = models.std_normal(2)
    k = arwmh(t)
    states, last = collect_states_logscale(
        k, jax.random.PRNGKey(7), n_pow=3, n_chains=2
    )
    n_expected = len(ns_logscale(3))
    assert states.position.shape == (n_expected, 2, 2)
    assert states.as_change.shape == (n_expected, 2)
    np.testing.assert_array_equal(
        np.asarray(states.i), np.asarray(ns_logscale(3))
    )
    assert int(last.i) == 1000


def test_sample_pnx_nuts():
    from adaptive_mcmc_tpu import nuts

    t = models.std_normal(2)
    k = nuts(t)
    adapt = get_init_adapt_state(k, jax.random.PRNGKey(8),
                                 position=jnp.zeros(2))
    x = jnp.zeros((2, 2))
    out = sample_pnx(k, jax.random.PRNGKey(9), x, adapt, n=2, n_samples=16)
    assert out.shape == (2, 16, 2)
    assert bool(jnp.all(jnp.isfinite(out)))
    # frozen NUTS actually moves
    assert float(jnp.std(out)) > 0.1


def test_sample_pnx_sa():
    from adaptive_mcmc_tpu import sa, SAConfig

    t = models.std_normal(2)
    k = sa(t, SAConfig(adapt_state_size=16))
    adapt = get_init_adapt_state(k, jax.random.PRNGKey(10),
                                 position=jnp.zeros(2))
    x = jnp.zeros((3, 2))
    out = sample_pnx(k, jax.random.PRNGKey(11), x, adapt, n=2, n_samples=8)
    assert out.shape == (3, 8, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_determinism_same_seed():
    """Two identical runs produce identical draws (reference fixed-seed
    reproducibility, SURVEY §4)."""
    t = models.eight_schools_noncentered()
    for build in (arwmh, asss):
        k = build(t)
        a, _, _ = run_mcmc(k, jax.random.PRNGKey(7), num_warmup=20,
                           num_samples=50, n_chains=3)
        b, _, _ = run_mcmc(k, jax.random.PRNGKey(7), num_warmup=20,
                           num_samples=50, n_chains=3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c, _, _ = run_mcmc(k, jax.random.PRNGKey(8), num_warmup=20,
                           num_samples=50, n_chains=3)
        assert not np.allclose(np.asarray(a), np.asarray(c))


def test_collect_states_logscale_chunked_matches():
    """Host-level chunking (max_steps_per_call) must not change the
    collected trajectory — same step sequence, same RNG path, different
    program boundaries."""
    t = models.std_normal(2)
    k = arwmh(t)
    a, _ = collect_states_logscale(
        k, jax.random.PRNGKey(3), n_pow=3, n_chains=4
    )
    b, _ = collect_states_logscale(
        k, jax.random.PRNGKey(3), n_pow=3, n_chains=4,
        max_steps_per_call=97,
    )
    np.testing.assert_allclose(
        np.asarray(a.position), np.asarray(b.position), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.as_change), np.asarray(b.as_change), rtol=1e-5,
        atol=1e-7,
    )


def test_diagnostics_str_all_kernels():
    """diagnostics_str must work for every kernel family's adapt-state
    field naming (regression: NUTS's dual-averaging state has da.log_eps,
    not log_step_size — quickstart.py crashed on it)."""
    from adaptive_mcmc_tpu import asss
    from adaptive_mcmc_tpu.kernels.nuts import nuts
    from adaptive_mcmc_tpu.kernels.sa import sa

    t = models.eight_schools_noncentered()
    for build in (arwmh, asss, nuts, sa):
        mcmc = MCMC(build(t), num_warmup=50, num_samples=50, n_chains=4)
        mcmc.run(jax.random.PRNGKey(3))
        out = mcmc.diagnostics_str()
        assert ("Acceptance rate" in out) or ("Potential Energy" in out), (
            build, out,
        )
