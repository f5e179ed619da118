"""ASSS kernel semantics: stereographic maps, shrinkage, adaptation,
posterior correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu import ASSSConfig, asss, models, run_mcmc
from adaptive_mcmc_tpu.kernels.asss import (
    ASSSAdaptState,
    stereographic_inverse,
    stereographic_project,
)


def test_projection_roundtrip_and_sphere():
    d, C = 5, 7
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (C, d)) * 3.0
    loc = jax.random.normal(jax.random.PRNGKey(1), (C, d))
    a = jax.random.normal(jax.random.PRNGKey(2), (C, d, d)) * 0.2
    scale = jnp.linalg.cholesky(
        jnp.einsum("cij,ckj->cik", a, a) + jnp.eye(d)
    )
    z = stereographic_project(x, loc, scale)
    assert z.shape == (C, d + 1)
    np.testing.assert_allclose(
        jnp.sum(z * z, axis=-1), jnp.ones(C), rtol=1e-5
    )
    x2 = stereographic_inverse(z, loc, scale)
    np.testing.assert_allclose(x, x2, rtol=1e-3, atol=1e-4)


def test_step_positions_change_and_pe_matches():
    t = models.eight_schools_noncentered()
    k = asss(t)
    st = k.init(jax.random.PRNGKey(3), n_chains=4)
    st2 = k.step(st)
    assert not jnp.allclose(st.position, st2.position)
    pe_want = jax.vmap(t.potential_fn)(st2.position)
    np.testing.assert_allclose(st2.potential_energy, pe_want, rtol=1e-4)


def test_batched_equals_single_chain():
    t = models.std_normal(3)
    k = asss(t)
    stb = k.init(jax.random.PRNGKey(4), n_chains=3)
    for _ in range(3):
        stb = k.step(stb)

    sts = k.init(jax.random.PRNGKey(4), n_chains=3)
    singles = []
    for c in range(3):
        s = jax.tree.map(
            lambda a: a[c : c + 1] if a.ndim >= 1 and a.shape[0] == 3 else a,
            sts,
        )
        for _ in range(3):
            s = k.step(s)
        singles.append(s)
    pos = jnp.concatenate([s.position for s in singles])
    np.testing.assert_allclose(stb.position, pos, rtol=1e-4, atol=1e-5)


def test_adaptation_recursion():
    t = models.std_normal(2)
    k = asss(t)
    st1 = k.step(k.init(jax.random.PRNGKey(5), n_chains=1))
    st2 = k.step(st1)
    gamma = 2.0 ** (-2.0 / 3.0)
    delta = st2.position[0] - st1.adapt_state.loc[0]
    np.testing.assert_allclose(
        st2.adapt_state.loc[0],
        st1.adapt_state.loc[0] + gamma * delta,
        rtol=1e-5,
    )
    want_cov = (1 - gamma) * (
        st1.adapt_state.scale[0] @ st1.adapt_state.scale[0].T
    ) + gamma * jnp.outer(delta, delta)
    got = st2.adapt_state.scale[0] @ st2.adapt_state.scale[0].T
    np.testing.assert_allclose(got, want_cov, rtol=1e-4, atol=1e-5)
    # as_change = ||dloc|| + ||dscale||_F
    want_change = jnp.linalg.norm(
        st2.adapt_state.loc[0] - st1.adapt_state.loc[0]
    ) + jnp.linalg.norm(st2.adapt_state.scale[0] - st1.adapt_state.scale[0])
    np.testing.assert_allclose(st2.as_change[0], want_change, rtol=1e-4)


def test_posterior_moments_std_normal():
    t = models.std_normal(2)
    k = asss(t, ASSSConfig(num_warmup=1000))
    samples, _, _ = run_mcmc(
        k, jax.random.PRNGKey(6), num_warmup=1000, num_samples=3000,
        n_chains=32,
    )
    flat = samples.reshape(-1, 2)
    np.testing.assert_allclose(jnp.mean(flat, 0), jnp.zeros(2), atol=0.08)
    np.testing.assert_allclose(jnp.std(flat, 0), jnp.ones(2), atol=0.08)


def test_mixture_both_modes_visited():
    t = models.gaussian_mixture_1d()
    k = asss(t, ASSSConfig(num_warmup=500))
    samples, _, _ = run_mcmc(
        k, jax.random.PRNGKey(7), num_warmup=500, num_samples=2000,
        n_chains=16,
    )
    flat = samples.reshape(-1)
    frac_right = float(jnp.mean(flat > 0))
    assert 0.3 < frac_right < 0.7, frac_right


def test_step_n_matches_sync_statistically():
    """The pipelined step_n must sample the same distribution as n sync
    steps (per-chain trip machines vs lockstep; RNG split order differs,
    so agreement is statistical, over many chains)."""
    t = models.std_normal(3)
    k = asss(t, ASSSConfig(num_warmup=0))
    s0 = k.init(jax.random.PRNGKey(3), n_chains=512)

    @jax.jit
    def run_sync(s):
        return jax.lax.fori_loop(0, 800, lambda _, x: k.step(x), s)

    s_sync = run_sync(s0)
    s_async = k.step_n(s0, 800)
    assert int(s_async.i) == 800
    for tag, s in (("sync", s_sync), ("async", s_async)):
        pos = np.asarray(s.position)
        assert abs(pos.mean()) < 0.15, (tag, pos.mean())
        assert abs(pos.std() - 1.0) < 0.15, (tag, pos.std())
    # pooled first/second moments agree between the two drivers
    np.testing.assert_allclose(
        np.asarray(s_sync.position).mean(axis=0),
        np.asarray(s_async.position).mean(axis=0),
        atol=0.2,
    )


def test_step_n_single_step_invariance():
    """pi P = pi for ONE pipelined transition from exact target samples
    (the reference's invariance check, asumptions_check cells 27-28)."""
    import scipy.stats

    t = models.std_normal(1)
    k = asss(t, ASSSConfig(num_warmup=0, adapt=False))
    key = jax.random.PRNGKey(11)
    n = 20_000
    exact = jax.random.normal(key, (n, 1))
    # fixed projection center/scale: a state-dependent loc (init's
    # default loc = x0) correlates kernel and state, which breaks the
    # POOLED invariance this test checks
    frozen = ASSSAdaptState(
        loc=jnp.zeros((n, 1)),
        scale=jnp.broadcast_to(jnp.eye(1), (n, 1, 1)),
    )
    state = k.init(
        jax.random.PRNGKey(12), n_chains=n, position=exact,
        adapt_state=frozen,
    )
    out = k.step_n(state, 1)
    ks = scipy.stats.kstest(np.asarray(out.position[:, 0]), "norm")
    assert ks.pvalue > 1e-3, ks


def test_collect_n_matches_step_n():
    """collect_n runs the SAME body sequence as one step_n call: the final
    state must be bitwise equal and the buffered frames must be the
    per-chain thinned trajectory (last frame == final position)."""
    t = models.eight_schools_noncentered()
    k = asss(t, ASSSConfig(num_warmup=10))
    state = k.init(jax.random.PRNGKey(3), n_chains=8)
    state = k.step_n(state, 10)  # through warmup

    want = k.step_n(state, 20)
    got, bufs = k.collect_n(state, n_frames=4, thinning=5)

    np.testing.assert_array_equal(
        np.asarray(want.position), np.asarray(got.position)
    )
    np.testing.assert_array_equal(
        np.asarray(want.adapt_state.loc), np.asarray(got.adapt_state.loc)
    )
    assert bufs["position"].shape == (8, 4, 10)
    assert bufs["potential_energy"].shape == (8, 4)
    assert bufs["as_change"].shape == (8, 4)
    # the last recorded frame IS the final state (chains stop at n_steps)
    np.testing.assert_array_equal(
        np.asarray(bufs["position"][:, -1]), np.asarray(got.position)
    )
    np.testing.assert_array_equal(
        np.asarray(bufs["potential_energy"][:, -1]),
        np.asarray(got.potential_energy),
    )
    assert np.isfinite(np.asarray(bufs["position"])).all()


def test_collect_n_drift_window_engages():
    """With n_frames >> RING the drift bound must freeze/resume chains
    without changing the trajectory: final state still bitwise equals
    one step_n call over the same transition count.

    Pinned to pipeline_unroll=1: with K>1 XLA fuses the unrolled body
    pair differently around the freeze select, so resumed chains pick up
    1-ulp rounding differences vs the never-frozen step_n program
    (statistically identical, not bitwise — see the production-config
    structural test below)."""
    t = models.eight_schools_noncentered()
    k = asss(t, ASSSConfig(num_warmup=20, pipeline_unroll=1))
    state = k.init(jax.random.PRNGKey(9), n_chains=8)
    state = k.step_n(state, 20)

    want = k.step_n(state, 120)
    got, bufs = k.collect_n(state, n_frames=60, thinning=2)
    np.testing.assert_array_equal(
        np.asarray(want.position), np.asarray(got.position)
    )
    np.testing.assert_array_equal(
        np.asarray(bufs["position"][:, -1]), np.asarray(got.position)
    )
    assert np.isfinite(np.asarray(bufs["position"])).all()
    # interior frames must be real draws, not unflushed zeros
    assert not (np.asarray(bufs["position"]) == 0.0).all(axis=-1).any()


def test_collect_n_drift_production_unroll():
    """Production config (default pipeline_unroll): freeze/resume under
    drift pressure must stay structurally sound — last frame IS the
    final state (same program, exact), every frame flushed and finite,
    and the draw distribution matches step_n's statistically."""
    import scipy.stats

    t = models.eight_schools_noncentered()
    k = asss(t, ASSSConfig(num_warmup=20))
    state = k.init(jax.random.PRNGKey(9), n_chains=8)
    state = k.step_n(state, 20)

    want = k.step_n(state, 120)
    got, bufs = k.collect_n(state, n_frames=60, thinning=2)
    np.testing.assert_array_equal(
        np.asarray(bufs["position"][:, -1]), np.asarray(got.position)
    )
    pos = np.asarray(bufs["position"])
    assert np.isfinite(pos).all()
    assert not (pos == 0.0).all(axis=-1).any()
    # 1-ulp freeze-select rounding decorrelates trajectories over 120
    # chaotic transitions, so compare distributions, not points
    ks = scipy.stats.ks_2samp(
        pos[..., 0].ravel(), np.asarray(want.position)[:, 0]
    )
    assert ks.pvalue > 1e-4, ks


def test_probe_trips_matches_step():
    """kernel.probe (PERF trip diagnostics) must replay step's exact
    dynamics: same draws bitwise, and trip means in the sane sub-50
    range (bail-out cap)."""
    t = models.eight_schools_noncentered()
    k = asss(t, ASSSConfig(num_warmup=0))
    state = k.init(jax.random.PRNGKey(3), n_chains=16)
    s_step = k.step(k.step(state))
    s_probe, mean_trips = k.probe(state, 2)
    np.testing.assert_array_equal(
        np.asarray(s_step.position), np.asarray(s_probe.position)
    )
    mt = np.asarray(mean_trips)
    assert mt.shape == (16,)
    assert (mt >= 0).all() and (mt <= 50).all()
