"""NUTS: statistical correctness on analytically-known targets, adaptation
behavior, divergence detection."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu import NUTSConfig, models, nuts, run_mcmc
from adaptive_mcmc_tpu.infer.diagnostics import gelman_rubin
from adaptive_mcmc_tpu.kernels.nuts import build_warmup_schedule


def test_warmup_schedule_structure():
    in_win, win_end = build_warmup_schedule(1000)
    # Stan windows: [75, 100), [100, 150), [150, 250), [250, 450), [450, 950)
    assert not bool(in_win[:75].any())
    assert bool(in_win[75:950].all())
    assert not bool(in_win[950:].any())
    ends = np.where(np.asarray(win_end))[0]
    np.testing.assert_array_equal(ends, [99, 149, 249, 449, 949])
    # tiny warmup: no mass windows
    in_win_s, win_end_s = build_warmup_schedule(10)
    assert not bool(in_win_s.any())


def test_std_normal_posterior():
    t = models.std_normal(5)
    k = nuts(t, NUTSConfig(num_warmup=500))
    samples, _, last = run_mcmc(
        k, jax.random.PRNGKey(0), num_warmup=500, num_samples=500,
        n_chains=16,
    )
    flat = samples.reshape(-1, 5)
    np.testing.assert_allclose(jnp.mean(flat, 0), jnp.zeros(5), atol=0.1)
    np.testing.assert_allclose(jnp.std(flat, 0), jnp.ones(5), atol=0.1)
    r = gelman_rubin(samples)
    assert float(jnp.max(r)) < 1.1
    # adapted acceptance should be near the 0.8 target
    acc = float(jnp.mean(last.mean_accept_prob))
    assert 0.55 < acc < 0.99, acc


def test_correlated_gaussian_dense_mass():
    rho = 0.9
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    L = jnp.linalg.cholesky(cov)
    t = models.mvn(jnp.zeros(2), L)
    k = nuts(t, NUTSConfig(num_warmup=600, dense_mass=True))
    samples, _, _ = run_mcmc(
        k, jax.random.PRNGKey(1), num_warmup=600, num_samples=600,
        n_chains=8,
    )
    flat = samples.reshape(-1, 2)
    emp_cov = jnp.cov(flat.T)
    np.testing.assert_allclose(emp_cov, cov, atol=0.15)


def test_num_steps_bounded_by_tree_depth():
    t = models.std_normal(3)
    cfg = NUTSConfig(num_warmup=100, max_tree_depth=6)
    k = nuts(t, cfg)
    _, extras, last = run_mcmc(
        k, jax.random.PRNGKey(2), num_warmup=100, num_samples=50,
        n_chains=4, extra_fields=("num_steps",),
    )
    assert int(jnp.max(extras["num_steps"])) <= 2**6


def test_divergences_on_funnel_like_target():
    """Neal's funnel produces divergences for NUTS without reparam —
    the diverging flag must fire at least occasionally."""
    def potential(x):
        v, theta = x[0], x[1:]
        return (
            0.5 * (v / 3.0) ** 2
            + 0.5 * jnp.sum(theta**2) * jnp.exp(-v)
            + 0.5 * (x.shape[0] - 1) * v
        )

    from adaptive_mcmc_tpu.models.base import SiteSpec, Target

    t = Target("funnel", 5, potential, (SiteSpec("x", 5, (5,)),))
    k = nuts(t, NUTSConfig(num_warmup=300))
    _, extras, _ = run_mcmc(
        k, jax.random.PRNGKey(3), num_warmup=300, num_samples=300,
        n_chains=8, extra_fields=("diverging",),
    )
    assert extras["diverging"].dtype == bool


def test_eight_schools_runs_and_converges():
    t = models.eight_schools_noncentered()
    k = nuts(t, NUTSConfig(num_warmup=500))
    samples, _, _ = run_mcmc(
        k, jax.random.PRNGKey(4), num_warmup=500, num_samples=500,
        n_chains=8,
    )
    assert np.isfinite(np.asarray(samples)).all()
    sites = t.constrain(samples.reshape(-1, t.dim))
    mu_mean = float(jnp.mean(sites["mu"]))
    tau_med = float(jnp.median(sites["tau"]))
    # canonical eight-schools posterior: mu ~ 4.4, tau median ~ 3-4
    assert 2.0 < mu_mean < 7.0, mu_mean
    assert 1.0 < tau_med < 8.0, tau_med


def test_energy_conservative_for_tiny_steps():
    """With a tiny fixed step size and no adaptation, acceptance ~ 1."""
    t = models.std_normal(4)
    cfg = NUTSConfig(
        step_size=1e-3, adapt_step_size=False, adapt_mass_matrix=False,
        num_warmup=0, max_tree_depth=4,
    )
    k = nuts(t, cfg)
    _, _, last = run_mcmc(
        k, jax.random.PRNGKey(5), num_warmup=0, num_samples=20, n_chains=4
    )
    assert float(jnp.min(last.mean_accept_prob)) > 0.99


def test_uturn_checkpoint_indexing_vs_bruteforce():
    """The iterative U-turn bookkeeping (nuts.py _build_subtree) must check
    exactly the balanced-subtree boundaries: at odd leaf n, the subtrees
    (n+1-2^k .. n) for k = 1..trailing_ones(n), whose first-leaf checkpoints
    live at slots popcount(n>>1)-k+1 .. popcount(n>>1).  Round-1 regression:
    a stack-pointer scheme popped live checkpoints and re-checked wrong
    subtrees, breaking NUTS reversibility (eight-schools log_tau bias)."""
    max_depth = 6
    for num_leaves in (2, 4, 8, 16, 32, 64):
        slot_of = {}  # first leaf -> slot at push time
        for n in range(num_leaves):
            if n % 2 == 0:
                slot = bin(n >> 1).count("1")
                slot_of[n] = slot
            else:
                t = 0
                m = n
                while m & 1:
                    t += 1
                    m >>= 1
                idx_max = bin(n >> 1).count("1")
                for k in range(1, t + 1):
                    first = n + 1 - 2**k
                    assert first in slot_of
                    # the slot the scheme reads for this closing subtree
                    read_slot = idx_max - (k - 1)
                    # must equal where that first leaf pushed, and not have
                    # been overwritten since
                    assert read_slot == slot_of[first], (n, k)
                    for m2 in range(first + 2, n, 2):
                        assert slot_of[m2] != slot_of[first], (n, k, m2)


def test_eight_schools_quadrature_truth():
    """NUTS must reproduce the analytically-known eight-schools marginals:
    integrating theta_base out gives y_j ~ N(mu, sigma_j^2 + tau^2), so
    E[log_tau], E[mu] follow from 2-D quadrature (truth: 0.8022, 4.397).
    Round-1 regression: the broken U-turn stack biased mean(log_tau) +0.05."""
    t = models.eight_schools_noncentered()
    k = nuts(t, NUTSConfig(num_warmup=700))
    samples, _, _ = run_mcmc(
        k, jax.random.PRNGKey(3), num_warmup=700, num_samples=250,
        thinning=1, n_chains=48,
    )
    s = np.asarray(samples).reshape(-1, t.dim)
    # ~12k near-iid draws: SE(mean log_tau) ~ 1.17/sqrt(8000) ~ 0.013
    assert abs(s[:, 1].mean() - 0.8022) < 0.045, s[:, 1].mean()
    assert abs(s[:, 1].std() - 1.1711) < 0.06, s[:, 1].std()
    assert abs(s[:, 0].mean() - 4.397) < 0.25, s[:, 0].mean()


def test_kidiq_quadrature_truth():
    """kidiq has a flat beta prior, so beta|y is centered at OLS exactly and
    log_sigma moments follow from 1-D quadrature (experiments/quadrature.py).
    Validates model + kernel against a non-circular ground truth."""
    from adaptive_mcmc_tpu.experiments.quadrature import kidiq_truth

    truth = kidiq_truth()
    t = models.kidiq()
    k = nuts(t, NUTSConfig(num_warmup=500))
    samples, _, _ = run_mcmc(
        k, jax.random.PRNGKey(11), num_warmup=500, num_samples=150,
        thinning=1, n_chains=32,
    )
    s = np.asarray(samples).reshape(-1, t.dim)
    np.testing.assert_allclose(
        s[:, :3].mean(0), truth["mean_beta"],
        atol=float(4 * truth["sd_beta"].max() / np.sqrt(500) + 0.05),
    )
    assert abs(s[:, 3].mean() - truth["mean_log_sigma"]) < 0.015


def test_step_n_matches_sync_statistically():
    """The pipelined step_n (one batched leapfrog per while-iteration,
    per-chain tree machines) must sample the same distribution as n
    lockstep steps — RNG split order differs, so agreement is statistical
    over many chains, including the adaptation end state."""
    t = models.eight_schools_noncentered()
    k = nuts(t, NUTSConfig(num_warmup=300))
    s0 = k.init(jax.random.PRNGKey(3), n_chains=256)

    @jax.jit
    def run_sync(s):
        return jax.lax.fori_loop(0, 600, lambda _, x: k.step(x), s)

    s_sync = run_sync(s0)
    s_async = k.step_n(s0, 600)
    assert int(s_async.i) == 600
    # pooled posterior moments agree between drivers
    np.testing.assert_allclose(
        np.asarray(s_sync.position).mean(axis=0),
        np.asarray(s_async.position).mean(axis=0),
        atol=0.5,
    )
    np.testing.assert_allclose(
        np.asarray(s_sync.position).std(axis=0),
        np.asarray(s_async.position).std(axis=0),
        rtol=0.35, atol=0.15,
    )
    # adaptation converged to the same step-size/mass-matrix scale
    eps_sync = np.exp(np.asarray(s_sync.adapt_state.da.log_eps_avg)).mean()
    eps_async = np.exp(np.asarray(s_async.adapt_state.da.log_eps_avg)).mean()
    assert abs(np.log(eps_async) - np.log(eps_sync)) < 0.35, (
        eps_sync, eps_async,
    )
    np.testing.assert_allclose(
        np.asarray(s_sync.adapt_state.inv_mass).mean(axis=0),
        np.asarray(s_async.adapt_state.inv_mass).mean(axis=0),
        rtol=0.5, atol=0.1,
    )
    # both report healthy acceptance statistics
    for s in (s_sync, s_async):
        ap = float(np.asarray(s.mean_accept_prob).mean())
        assert 0.6 < ap < 0.99, ap


def test_step_n_frozen_kernel_invariance():
    """pi P = pi for pipelined transitions with adaptation frozen: start
    chains from exact std-normal draws, advance 3 transitions, KS-test the
    pooled result against N(0, 1)."""
    import scipy.stats

    t = models.std_normal(2)
    k = nuts(t, NUTSConfig(
        num_warmup=0, adapt_step_size=False, adapt_mass_matrix=False,
        step_size=0.5,
    ))
    n = 8192
    exact = jax.random.normal(jax.random.PRNGKey(21), (n, 2))
    state = k.init(jax.random.PRNGKey(22), n_chains=n, position=exact)
    out = k.step_n(state, 3)
    pooled = np.asarray(out.position).reshape(-1)
    ks = scipy.stats.kstest(pooled, "norm")
    assert ks.pvalue > 1e-3, ks


def test_collect_n_matches_step_n():
    """collect_n shares step_n's body sequence: bitwise-equal final state,
    buffers hold the per-chain thinned trajectory."""
    t = models.eight_schools_noncentered()
    k = nuts(t, NUTSConfig(num_warmup=20))
    state = k.init(jax.random.PRNGKey(5), n_chains=6)
    state = k.step_n(state, 20)  # through warmup

    want = k.step_n(state, 12)
    got, bufs = k.collect_n(state, n_frames=4, thinning=3)

    np.testing.assert_array_equal(
        np.asarray(want.position), np.asarray(got.position)
    )
    np.testing.assert_array_equal(
        np.asarray(want.potential_energy), np.asarray(got.potential_energy)
    )
    assert bufs["position"].shape == (6, 4, 10)
    assert bufs["potential_energy"].shape == (6, 4)
    np.testing.assert_array_equal(
        np.asarray(bufs["position"][:, -1]), np.asarray(got.position)
    )
    np.testing.assert_array_equal(
        np.asarray(bufs["potential_energy"][:, -1]),
        np.asarray(got.potential_energy),
    )
    assert np.isfinite(np.asarray(bufs["position"])).all()


def test_collect_n_drift_window_engages():
    """n_frames >> RING: drift-frozen chains must resume bitwise (the
    freeze wrapper restores every _Pipe leaf, so the resumed stream is
    the step_n one)."""
    t = models.eight_schools_noncentered()
    k = nuts(t, NUTSConfig(num_warmup=30))
    state = k.init(jax.random.PRNGKey(13), n_chains=8)
    state = k.step_n(state, 30)

    want = k.step_n(state, 120)
    got, bufs = k.collect_n(state, n_frames=60, thinning=2)
    np.testing.assert_array_equal(
        np.asarray(want.position), np.asarray(got.position)
    )
    np.testing.assert_array_equal(
        np.asarray(bufs["position"][:, -1]), np.asarray(got.position)
    )
    assert np.isfinite(np.asarray(bufs["position"])).all()
    assert not (np.asarray(bufs["position"]) == 0.0).all(axis=-1).any()
