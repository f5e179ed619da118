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
    identical to the dense O(N*Kc) evaluation.  Both f32 paths are
    checked against an f64 dense truth: tight in the posterior-typical
    region (what MH acceptance consumes), loose at wide excursions
    (PE differences there are ~1e2-1e5, accept probs 0 either way).
    The last block is the round-4 regression guard: the f32 potential
    GRADIENT error at the gold mean, mapped through the gold posterior
    covariance, must predict a negligible posterior-mean shift — the
    textbook ycTyc - 2bTXcTyc + bTGb expansion failed exactly this
    (cancellation at cond(G)~3.4e5 shifted the collinear b means by
    ~0.08 gold-sd; w_eval rmse 0.0447 vs reference 0.0157)."""
    t_ss = models.diamonds(suff_stats=True)
    t_dn = models.diamonds(suff_stats=False)

    # f64 dense truth (numpy; no global jax x64 flip)
    d = models.data.diamonds()
    X = np.asarray(d["X"], np.float64)
    Y = np.asarray(d["Y"], np.float64)
    Kc = X.shape[1] - 1
    Xc = X[:, 1:] - X[:, 1:].mean(0, keepdims=True)
    N = len(Y)

    def pot64(x):
        x = np.asarray(x, np.float64)
        a, b, ls = x[0], x[1:1 + Kc], x[1 + Kc]
        sig = np.exp(ls)
        z = (a - 8.0) / 10.0
        lp = -2.0 * np.log1p(z * z / 3.0)        # student-t(3,8,10) kernel
        lp += -0.5 * np.sum(b * b)               # N(0,1) kernel
        zs = sig / 10.0
        lp += -2.0 * np.log1p(zs * zs / 3.0) + ls  # folded-t kernel + jac
        r = Y - (a + Xc @ b)
        lp += -N * ls - 0.5 * np.sum(r * r) / (sig * sig)
        return -lp  # up to x-independent constants

    rng = np.random.default_rng(7)
    base = np.zeros(t_ss.dim, np.float32)
    base[0] = 8.0
    base[-1] = -1.5
    pts = base + np.concatenate(
        [rng.standard_normal((64, t_ss.dim)) * 0.1,
         rng.standard_normal((64, t_ss.dim)) * 2.0]
    ).astype(np.float32)
    pe_ss = np.asarray(jax.vmap(t_ss.potential_fn)(jnp.asarray(pts)),
                       np.float64)
    pe_dn = np.asarray(jax.vmap(t_dn.potential_fn)(jnp.asarray(pts)),
                       np.float64)
    # pairwise differences vs f64 truth (constants cancel in differences).
    # NB the *0.1 cloud is 0.1 ABSOLUTE per dim — up to ~100 posterior sd
    # along the stiff collinear directions — so it gets a loose bound;
    # the tight bound lives on the posterior-scale cloud below.
    pe_64 = np.array([pot64(p) for p in pts])
    for pe, tag in ((pe_ss, "suff"), (pe_dn, "dense")):
        d_f32 = pe[:64] - pe[32:96]
        d_f64 = pe_64[:64] - pe_64[32:96]
        err = np.abs(d_f32 - d_f64)
        rel = err / np.maximum(np.abs(d_f64), 1.0)
        assert rel[:32].max() < 1e-2, (tag, rel[:32].max())
        assert rel[32:].max() < 2e-2, (tag, rel[32:].max())

    # the region the chain actually visits: gold-sd-scaled perturbations
    # around the gold mean — differences must be f32-exact here
    from pathlib import Path

    gold = np.load(
        Path(models.data.__file__).parent / "_gold" / "diamonds.npy"
    ).astype(np.float64)
    gm = gold.mean(0)
    gsd = gold.std(0)
    rng2 = np.random.default_rng(3)
    pp = (gm[None, :] + rng2.standard_normal((64, t_ss.dim))
          * gsd[None, :]).astype(np.float32)
    pp64 = np.array([pot64(p) for p in pp])
    for t, tag in ((t_ss, "suff"), (t_dn, "dense")):
        pe = np.asarray(jax.vmap(t.potential_fn)(jnp.asarray(pp)),
                        np.float64)
        dd = (pe[:32] - pe[32:]) - (pp64[:32] - pp64[32:])
        rel = np.abs(dd) / np.maximum(np.abs(pp64[:32] - pp64[32:]), 1.0)
        assert rel.max() < 2e-4, (tag, rel.max())

    # regression guard: f32 gradient error at the gold mean must not
    # predict a posterior-mean shift (shift ~= -C_gold @ grad_err)
    C = np.cov(gold.T)
    h = 1e-5
    g64 = np.array([
        (pot64(gm + h * np.eye(t_ss.dim)[i])
         - pot64(gm - h * np.eye(t_ss.dim)[i])) / (2 * h)
        for i in range(t_ss.dim)
    ])
    for t, tag in ((t_ss, "suff"), (t_dn, "dense")):
        g32 = np.asarray(
            jax.grad(t.potential_fn)(jnp.asarray(gm, jnp.float32)),
            np.float64,
        )
        shift = np.abs(C @ (g32 - g64)) / gold.std(0)
        assert shift.max() < 5e-3, (tag, shift.max())

    # gradients agree between the two f32 paths too (NUTS path)
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
