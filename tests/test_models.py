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
