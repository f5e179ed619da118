"""Concrete targets: the three PosteriorDB posteriors + synthetic targets.

Each builder returns a :class:`Target` whose ``potential_fn`` is a
hand-written unconstrained-space negative log-density reproducing the
reference's NumPyro models:

* eight-schools noncentered — run_eight_schools_wasserstein.py:25-34
* eight-schools centered    — run_eight_schools_lr_decay.py:20-35
* diamonds GLM              — run_diamonds_wasserstein.py:23-39
* kidiq linear regression   — run_kidiq_kidscore_wasserstein.py:29-41
* synthetic Normal / 2-component Gaussian mixture — asumptions_check.ipynb
  cells 4 and 61 (the invariance/contraction test targets)

Site order matches NumPyro's ``ravel_pytree`` flattening (alphabetical site
names) so flat-vector trajectories are index-compatible with the reference.
All densities are fp32 and written with ``log1p``/``logaddexp`` so extreme
proposals produce -inf rather than NaN where possible; kernels additionally
NaN-guard every potential evaluation (arwmh.py:171).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from adaptive_mcmc_tpu.models import data as _data
from adaptive_mcmc_tpu.models.base import (
    _LOG_2PI,
    SiteSpec,
    Target,
    folded_student_t_logpdf,
    half_cauchy_logpdf,
    normal_logpdf,
    student_t_logpdf,
)

# plain float (NOT a jnp scalar): a module-level jnp array would
# initialise the XLA backend at import time, breaking
# jax.distributed.initialize in multi-process bootstraps
_LOG_2PI_T = float(np.float32(_LOG_2PI))


def eight_schools_noncentered(dataset: dict | None = None) -> Target:
    """Non-centered eight schools: mu ~ N(0,5), tau ~ HalfCauchy(5),
    theta = mu + tau * theta_base, theta_base ~ N(0,1), y ~ N(theta, sigma).

    Flat layout: [mu, log(tau), theta_base(8)] — dim 10.
    """
    d = dataset or _data.eight_schools()
    y = jnp.asarray(d["y"])
    sigma = jnp.asarray(d["sigma"])
    J = y.shape[0]

    def potential(x):
        mu, log_tau, tb = x[0], x[1], x[2:]
        tau = jnp.exp(log_tau)
        lp = normal_logpdf(mu, 0.0, 5.0)
        lp += half_cauchy_logpdf(tau, 5.0) + log_tau  # + log|d tau / d log_tau|
        lp += jnp.sum(normal_logpdf(tb))
        theta = mu + tau * tb
        lp += jnp.sum(normal_logpdf(y, theta, sigma))
        return -lp

    return Target(
        name="eight_schools_noncentered",
        dim=2 + J,
        potential_fn=potential,
        sites=(
            SiteSpec("mu", 1, ()),
            SiteSpec("tau", 1, (), "exp"),
            SiteSpec("theta_base", J, (J,)),
        ),
    )


def eight_schools_centered(dataset: dict | None = None) -> Target:
    """Centered parameterization (lr-decay experiments,
    run_eight_schools_lr_decay.py:26-35): theta ~ N(mu, tau) directly.

    Flat layout: [mu, log(tau), theta(8)] — dim 10.
    """
    d = dataset or _data.eight_schools()
    y = jnp.asarray(d["y"])
    sigma = jnp.asarray(d["sigma"])
    J = y.shape[0]

    def potential(x):
        mu, log_tau, theta = x[0], x[1], x[2:]
        tau = jnp.exp(log_tau)
        lp = normal_logpdf(mu, 0.0, 5.0)
        lp += half_cauchy_logpdf(tau, 5.0) + log_tau
        lp += jnp.sum(normal_logpdf(theta, mu, tau))
        lp += jnp.sum(normal_logpdf(y, theta, sigma))
        return -lp

    return Target(
        name="eight_schools_centered",
        dim=2 + J,
        potential_fn=potential,
        sites=(
            SiteSpec("mu", 1, ()),
            SiteSpec("tau", 1, (), "exp"),
            SiteSpec("theta", J, (J,)),
        ),
    )


def diamonds(dataset: dict | None = None, *,
             suff_stats: bool = True) -> Target:
    """Diamonds GLM (brms-style): in-model predictor centering,
    b ~ N(0,1)^Kc, Intercept ~ StudentT(3,8,10),
    sigma ~ Folded(StudentT(3,0,10)), Y ~ N(Intercept + Xc @ b, sigma).

    Flat layout: [Intercept, b(Kc), log(sigma)] — dim Kc+2 (26 for the real
    design). The centered design matrix is precomputed once (the reference
    recenters inside the model every evaluation —
    run_diamonds_wasserstein.py:25-28 — which XLA would CSE anyway; doing it
    at build time keeps the hot loop a single matvec).

    ``suff_stats`` (default): the Gaussian likelihood depends on the data
    only through fixed sufficient statistics, so the per-evaluation cost
    drops from O(N·Kc) (a (5000, 25) matvec + residual pass streamed from
    HBM every step) to O(Kc²) register math, evaluated in the
    cancellation-free form::

        SSE = ‖Y − a·1 − Xc b‖²
            = SSE_min + N (a − Ȳ)² + ‖Lᵀ(b − b̂)‖²

    with b̂ = (XcᵀXc)⁻¹Xcᵀyc, L = chol(XcᵀXc), SSE_min = ycᵀyc − b̂ᵀXcᵀyc
    all precomputed in float64 on the host (exact: SSE is a quadratic).
    Do NOT "simplify" back to the textbook expansion
    ycᵀyc − 2bᵀ(Xcᵀyc) + bᵀ(XcᵀXc)b: its three ~|ycᵀyc|-sized f32 terms
    cancel almost totally at this design (cond(XcᵀXc) ≈ 3.4e5), and the
    surviving rounding systematically biased the collinear-coefficient
    posterior means by ~0.08 gold-sd (round-4 regression; guarded by
    tests/test_models.py::test_diamonds_suff_stats_matches_dense).
    """
    d = dataset or _data.diamonds()
    X = jnp.asarray(d["X"])
    Y = jnp.asarray(d["Y"])
    Kc = X.shape[1] - 1
    Xc = X[:, 1:] - jnp.mean(X[:, 1:], axis=0, keepdims=True)

    if suff_stats:
        X64 = np.asarray(d["X"], np.float64)[:, 1:]
        X64 = X64 - X64.mean(axis=0, keepdims=True)
        Y64 = np.asarray(d["Y"], np.float64)
        N = Y64.shape[0]
        y_bar = Y64.mean()
        yc64 = Y64 - y_bar
        # Cancellation-free form of the exactly-quadratic SSE:
        #   SSE(a, b) = SSE_min + N (a − Ȳ)² + ‖Lᵀ(b − b̂)‖²,
        # b̂ = (XcᵀXc)⁻¹ Xcᵀyc (OLS), L = chol(XcᵀXc), all built in f64.
        # The textbook expansion ycᵀyc − 2bᵀXcᵀyc + bᵀXcᵀXc b evaluates
        # three ~|ycᵀyc|-sized terms whose f32 rounding survives the
        # near-total cancellation: at the diamonds design (cond(XcᵀXc)
        # ≈ 3.4e5) the induced potential-gradient error (~1.0 at the
        # posterior mean vs f64 truth) systematically shifted the
        # posterior mean of the collinear b coefficients by ~0.08 gold-sd
        # (measured round 4, w_eval rmse 0.0447 vs reference 0.0157).
        # Here every runtime term is posterior-scale, so f32 is exact to
        # working precision; same O(Kc²) cost.
        gram64 = X64.T @ X64
        xty64 = X64.T @ yc64
        b_hat64 = np.linalg.solve(gram64, xty64)
        L64 = np.linalg.cholesky(gram64)
        sse_min = jnp.float32(yc64 @ yc64 - b_hat64 @ xty64)
        lt = jnp.asarray(L64.T, jnp.float32)               # (Kc, Kc)
        b_hat = jnp.asarray(b_hat64, jnp.float32)          # (Kc,)
        n_f = jnp.float32(N)
        y_bar32 = jnp.float32(y_bar)

        def potential(x):
            intercept, b, log_sigma = x[0], x[1 : 1 + Kc], x[1 + Kc]
            sigma = jnp.exp(log_sigma)
            lp = student_t_logpdf(intercept, 3.0, 8.0, 10.0)
            lp += jnp.sum(normal_logpdf(b))
            lp += folded_student_t_logpdf(sigma, 3.0, 0.0, 10.0) + log_sigma
            # HIGHEST: the d×d matvec must be true fp32 (same reason as
            # the dense matmul below)
            u = jnp.dot(lt, b - b_hat,
                        precision=jax.lax.Precision.HIGHEST)
            da = intercept - y_bar32
            sse = sse_min + n_f * da * da + jnp.dot(u, u)
            lp += -0.5 * n_f * (_LOG_2PI_T + 2.0 * log_sigma) \
                - 0.5 * sse / (sigma * sigma)
            return -lp
    else:
        def potential(x):
            intercept, b, log_sigma = x[0], x[1 : 1 + Kc], x[1 + Kc]
            sigma = jnp.exp(log_sigma)
            lp = student_t_logpdf(intercept, 3.0, 8.0, 10.0)
            lp += jnp.sum(normal_logpdf(b))
            lp += folded_student_t_logpdf(sigma, 3.0, 0.0, 10.0) + log_sigma
            # HIGHEST: the likelihood matmul must be true fp32 — TPU's
            # default bf16 passes perturb the potential enough to bias the
            # posterior
            mu = intercept + jnp.dot(
                Xc, b, precision=jax.lax.Precision.HIGHEST
            )  # (N,) — batches of chains become one matmul
            lp += jnp.sum(normal_logpdf(Y, mu, sigma))
            return -lp

    return Target(
        name="diamonds",
        dim=Kc + 2,
        potential_fn=potential,
        sites=(
            SiteSpec("Intercept", 1, ()),
            SiteSpec("b", Kc, (Kc,)),
            SiteSpec("sigma", 1, (), "exp"),
        ),
    )


def kidiq(dataset: dict | None = None) -> Target:
    """kidiq regression: beta ~ ImproperUniform(R^3), sigma ~ HalfCauchy(2.5),
    kid_score ~ N([1, mom_hs, mom_iq] @ beta, sigma).

    Flat layout: [beta(3), log(sigma)] — dim 4.
    """
    d = dataset or _data.kidiq()
    ks = jnp.asarray(d["kid_score"])
    X = jnp.stack(
        [jnp.ones_like(ks), jnp.asarray(d["mom_hs"]), jnp.asarray(d["mom_iq"])],
        axis=1,
    )

    def potential(x):
        beta, log_sigma = x[:3], x[3]
        sigma = jnp.exp(log_sigma)
        lp = half_cauchy_logpdf(sigma, 2.5) + log_sigma  # beta: improper flat
        mu = jnp.dot(X, beta, precision=jax.lax.Precision.HIGHEST)
        lp += jnp.sum(normal_logpdf(ks, mu, sigma))
        return -lp

    return Target(
        name="kidiq",
        dim=4,
        potential_fn=potential,
        sites=(SiteSpec("beta", 3, (3,)), SiteSpec("sigma", 1, (), "exp")),
    )


# ---------------------------------------------------------------------------
# Synthetic analytically-known targets (invariance / contraction tests).
# ---------------------------------------------------------------------------

def std_normal(dim: int = 1) -> Target:
    def potential(x):
        return 0.5 * jnp.sum(x * x) + 0.5 * dim * jnp.log(2 * jnp.pi)

    return Target(
        name=f"std_normal_{dim}d", dim=dim, potential_fn=potential,
        sites=(SiteSpec("x", dim, (dim,)),),
    )


def gaussian_mixture_1d(locs=(-1.0, 1.0), scale=0.1, weights=(0.5, 0.5)) -> Target:
    """Two-component 1-D mixture (asumptions_check.ipynb cell 61)."""
    locs_a = jnp.asarray(locs)
    w = jnp.log(jnp.asarray(weights))

    def potential(x):
        comp = normal_logpdf(x[0], locs_a, scale) + w
        return -jax.scipy.special.logsumexp(comp)

    return Target(
        name="gaussian_mixture_1d", dim=1, potential_fn=potential,
        sites=(SiteSpec("x", 1, ()),),
    )


def mvn(loc, chol_cov) -> Target:
    """General multivariate normal given mean and Cholesky of covariance."""
    loc = jnp.asarray(loc)
    L = jnp.asarray(chol_cov)
    dim = loc.shape[0]
    half_logdet = jnp.sum(jnp.log(jnp.diagonal(L)))

    def potential(x):
        z = jax.scipy.linalg.solve_triangular(L, x - loc, lower=True)
        return 0.5 * jnp.sum(z * z) + half_logdet + 0.5 * dim * jnp.log(2 * jnp.pi)

    return Target(
        name=f"mvn_{dim}d", dim=dim, potential_fn=potential,
        sites=(SiteSpec("x", dim, (dim,)),),
    )
