"""Target log-density correctness: hand-computed values, transforms,
gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from adaptive_mcmc_tpu import models


def test_eight_schools_noncentered_value():
    t = models.eight_schools_noncentered()
    assert t.dim == 10
    x = jnp.array([1.0, 0.5, 0.1, -0.2, 0.3, 0.0, 0.1, -0.1, 0.2, 0.05])
    mu, log_tau, tb = 1.0, 0.5, np.array(x[2:])
    tau = np.exp(log_tau)
    d = models.data.eight_schools()
    y, sigma = d["y"], d["sigma"]
    lp = st.norm.logpdf(mu, 0, 5)
    lp += st.halfcauchy.logpdf(tau, scale=5) + log_tau
    lp += st.norm.logpdf(tb).sum()
    lp += st.norm.logpdf(y, mu + tau * tb, sigma).sum()
    np.testing.assert_allclose(float(t.potential_fn(x)), -lp, rtol=1e-5)


def test_eight_schools_centered_value():
    t = models.eight_schools_centered()
    x = jnp.arange(10, dtype=jnp.float32) / 10.0
    mu, log_tau, theta = 0.0, 0.1, np.arange(2, 10) / 10.0
    tau = np.exp(log_tau)
    d = models.data.eight_schools()
    lp = st.norm.logpdf(mu, 0, 5)
    lp += st.halfcauchy.logpdf(tau, scale=5) + log_tau
    lp += st.norm.logpdf(theta, mu, tau).sum()
    lp += st.norm.logpdf(d["y"], theta, d["sigma"]).sum()
    np.testing.assert_allclose(float(t.potential_fn(x)), -lp, rtol=1e-5)


def test_kidiq_value():
    t = models.kidiq()
    assert t.dim == 4
    x = jnp.array([10.0, 5.0, 0.5, 2.5])
    d = models.data.kidiq()
    beta, sigma = np.array([10.0, 5.0, 0.5]), np.exp(2.5)
    lp = st.halfcauchy.logpdf(sigma, scale=2.5) + 2.5
    X = np.stack([np.ones_like(d["mom_hs"]), d["mom_hs"], d["mom_iq"]], axis=1)
    lp += st.norm.logpdf(d["kid_score"], X @ beta, sigma).sum()
    np.testing.assert_allclose(float(t.potential_fn(x)), -lp, rtol=1e-4)


def test_diamonds_value():
    t = models.diamonds()
    d = models.data.diamonds()
    Kc = d["X"].shape[1] - 1
    assert t.dim == Kc + 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(t.dim) * 0.3, jnp.float32)
    intercept, b, log_sigma = float(x[0]), np.array(x[1:-1]), float(x[-1])
    sigma = np.exp(log_sigma)
    Xc = d["X"][:, 1:] - d["X"][:, 1:].mean(0, keepdims=True)
    lp = st.t.logpdf(intercept, df=3, loc=8, scale=10)
    lp += st.norm.logpdf(b).sum()
    lp += np.log(
        st.t.pdf(sigma, df=3, scale=10) + st.t.pdf(-sigma, df=3, scale=10)
    ) + log_sigma
    lp += st.norm.logpdf(d["Y"], intercept + Xc @ b, sigma).sum()
    np.testing.assert_allclose(float(t.potential_fn(x)), -lp, rtol=1e-3)


def test_diamonds_suff_stats_matches_dense():
    """The sufficient-statistic likelihood (default) is algebraically
    identical to the dense O(N·Kc) evaluation; verify both absolute
    values and — more importantly — potential DIFFERENCES between
    nearby points (what MH acceptance consumes) across the
    posterior-typical region and mild tails."""
    t_ss = models.diamonds(suff_stats=True)
    t_dn = models.diamonds(suff_stats=False)
    rng = np.random.default_rng(7)
    # posterior-typical-ish points: Intercept near 8, b small, log_sigma
    # negative-ish; plus wider excursions
    base = np.zeros(t_ss.dim, np.float32)
    base[0] = 8.0
    base[-1] = -1.5
    pts = base + np.concatenate(
        [rng.standard_normal((64, t_ss.dim)) * 0.1,
         rng.standard_normal((64, t_ss.dim)) * 2.0]
    ).astype(np.float32)
    pe_ss = jax.vmap(t_ss.potential_fn)(jnp.asarray(pts))
    pe_dn = jax.vmap(t_dn.potential_fn)(jnp.asarray(pts))
    # absolute agreement (PE magnitudes reach ~1e5 in the tails; the two
    # summation orders legitimately differ at f32 rounding)
    np.testing.assert_allclose(
        np.asarray(pe_ss), np.asarray(pe_dn), rtol=2e-5, atol=2e-2
    )
    # pairwise differences at the typical scale must agree much tighter
    d_ss = np.asarray(pe_ss[:64] - pe_ss[32:96])
    d_dn = np.asarray(pe_dn[:64] - pe_dn[32:96])
    np.testing.assert_allclose(d_ss, d_dn, rtol=1e-3, atol=5e-2)
    # gradients agree too (NUTS path)
    g_ss = jax.grad(t_ss.potential_fn)(jnp.asarray(pts[0]))
    g_dn = jax.grad(t_dn.potential_fn)(jnp.asarray(pts[0]))
    np.testing.assert_allclose(
        np.asarray(g_ss), np.asarray(g_dn), rtol=5e-4, atol=5e-3
    )


def test_constrain_unconstrain_roundtrip():
    for t in [
        models.eight_schools_noncentered(),
        models.diamonds(),
        models.kidiq(),
    ]:
        x = jax.random.normal(jax.random.PRNGKey(0), (3, t.dim)) * 0.5
        sites = t.constrain(x)
        x2 = t.unconstrain(sites)
        np.testing.assert_allclose(x, x2, rtol=1e-5, atol=1e-6)


def test_gradients_finite():
    for t in [
        models.eight_schools_noncentered(),
        models.eight_schools_centered(),
        models.diamonds(),
        models.kidiq(),
        models.std_normal(3),
        models.gaussian_mixture_1d(),
    ]:
        x = jnp.zeros(t.dim) + 0.1
        g = jax.grad(t.potential_fn)(x)
        assert jnp.all(jnp.isfinite(g)), t.name


def test_mixture_density_normalized():
    t = models.gaussian_mixture_1d()
    xs = jnp.linspace(-3, 3, 4001)[:, None]
    dens = jnp.exp(-jax.vmap(t.potential_fn)(xs))
    integral = jnp.trapezoid(dens, dx=6 / 4000)
    np.testing.assert_allclose(float(integral), 1.0, rtol=1e-3)


def test_mvn_potential():
    loc = jnp.array([1.0, -1.0])
    L = jnp.array([[2.0, 0.0], [0.5, 1.0]])
    t = models.mvn(loc, L)
    x = jnp.array([0.3, 0.7])
    want = -st.multivariate_normal.logpdf(
        np.array(x), np.array(loc), np.array(L @ L.T)
    )
    np.testing.assert_allclose(float(t.potential_fn(x)), want, rtol=1e-5)


def test_diamonds_reconstruction_matches_gold_analytically():
    """Non-circular validation of the real-posterior diamonds
    reconstruction (models/data.py fallback): the model is linear-Gaussian
    given sigma, so the exact posterior follows from the vendored
    sufficient statistics by 1-D quadrature over log(sigma) in f64.  The
    quadrature moments must match the reference's PosteriorDB gold draws
    (models/_gold/diamonds.npy) to within their 10k-draw Monte-Carlo
    noise — proving the synthesized dataset's posterior IS the real one
    (reference: python/mcmc_runs/diamonds-example-references.pkl via
    scripts/make_diamonds_real.py)."""
    from pathlib import Path

    stats = np.load(
        Path(models.data.__file__).parent / "_diamonds_stats.npz"
    )
    A = stats["A"].astype(np.float64)
    c = stats["c"].astype(np.float64)
    yty, n = float(stats["yty"]), int(stats["n"])
    gold = np.load(
        Path(models.data.__file__).parent / "_gold" / "diamonds.npy"
    ).astype(np.float64)
    k = A.shape[0]

    evals, evecs = np.linalg.eigh(A)
    c_t = evecs.T @ c

    def log_post_and_mean(ls):
        sig2 = np.exp(2.0 * ls)
        M = evals / sig2 + 1.0                    # posterior precision eigs
        mu_t = (c_t / sig2) / M
        logev = (
            -0.5 * n * np.log(sig2)
            - 0.5 * np.sum(np.log(M))
            - 0.5 * (yty / sig2 - np.sum(c_t**2 / (sig2**2 * M)))
        )
        sig = np.exp(ls)
        lprior = -2.0 * np.log1p(sig**2 / 300.0) + ls  # folded-t(3,0,10)
        return logev + lprior, mu_t

    g_ls = gold[:, -1]
    grid = np.linspace(
        g_ls.mean() - 8 * g_ls.std(), g_ls.mean() + 8 * g_ls.std(), 400
    )
    lp, mus = zip(*(log_post_and_mean(l) for l in grid))
    lp = np.asarray(lp) - max(lp)
    w = np.exp(lp)
    w /= w.sum()
    e_ls = float(np.sum(w * grid))
    sd_ls = float(np.sqrt(np.sum(w * (grid - e_ls) ** 2)))
    mu_b = evecs @ np.sum(w[:, None] * np.asarray(mus), axis=0)

    # 10k-draw MC noise on a mean is sd/100; allow 5 of those
    assert abs(e_ls - g_ls.mean()) < 5 * g_ls.std() / 100.0
    assert abs(sd_ls - g_ls.std()) / g_ls.std() < 0.05
    gb = gold[:, 1 : 1 + k]
    err = np.abs(mu_b - gb.mean(0)) / (gb.std(0) / 100.0)
    assert err.max() < 5.0, err.max()
