"""Lipschitz-NN contraction estimators: analytic ground truths.

For the AR(1)-style Gaussian kernel  P(x, ·) = N(ρ x, σ²)  the Wasserstein
contraction coefficient is exactly |ρ| (W(N(ρx, σ²), N(ρy, σ²)) = |ρ||x−y|),
giving a closed-form check the reference validates only visually
(asumptions_check.ipynb)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_mcmc_tpu.contraction import (
    apply_lipschitz_mlp,
    compute_kernel_distance,
    compute_kernel_distance_1d,
    compute_wasserstein_contraction,
    init_lipschitz_mlp,
    spectral_norm,
)


def _gauss_kernel_sampler(rho, sigma):
    def sample_px(key, X, n_samples):
        n_points, d = X.shape
        noise = jax.random.normal(key, (n_points, n_samples, d))
        return rho * X[:, None, :] + sigma * noise

    return sample_px


def test_spectral_norm_shrinks_only():
    w = jax.random.normal(jax.random.PRNGKey(0), (16, 8)) * 3.0
    wn = spectral_norm(w)
    s = jnp.linalg.svd(wn, compute_uv=False)[0]
    assert float(s) < 1.05
    # matrices already below norm 1 are untouched
    w_small = w / (jnp.linalg.svd(w, compute_uv=False)[0] * 2.0)
    np.testing.assert_allclose(spectral_norm(w_small), w_small, rtol=1e-5)


def test_mlp_is_lipschitz():
    params = init_lipschitz_mlp(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(jax.random.PRNGKey(2), (200, 3)) * 5.0
    y = x + jax.random.normal(jax.random.PRNGKey(3), (200, 3)) * 0.1
    fx = apply_lipschitz_mlp(params, x)
    fy = apply_lipschitz_mlp(params, y)
    ratio = jnp.abs(fx - fy) / jnp.linalg.norm(x - y, axis=-1)
    assert float(jnp.max(ratio)) <= 1.05


@pytest.mark.parametrize("rho", [0.5, 0.9])
def test_contraction_gaussian_kernel(rho):
    sample_px = _gauss_kernel_sampler(rho, sigma=0.3)
    X = jnp.linspace(-3, 3, 24)[:, None]
    tau, _, _ = compute_wasserstein_contraction(
        sample_px,
        jax.random.PRNGKey(4),
        X,
        sample_batch_size=256,
        n_train_batches=2,
        n_eval_batches=16,
        max_steps=60,
    )
    tau = float(tau)
    # estimator lower-bounds the true coefficient and should get close
    assert 0.6 * rho < tau < 1.15 * rho, tau


def test_kernel_distance_identical_kernels_zero():
    sample_px = _gauss_kernel_sampler(0.7, 0.3)
    X = jnp.linspace(-2, 2, 16)[:, None]
    rho_d, _, _ = compute_kernel_distance(
        sample_px, sample_px, jax.random.PRNGKey(5), X,
        sample_batch_size=128, n_train_batches=2, n_eval_batches=8,
        max_steps=30,
    )
    assert float(rho_d) < 0.05


def test_kernel_distance_detects_mean_shift():
    """P = N(x, σ²), Q = N(x + δ, σ²): test function f(x)=x gives
    |Pf − Qf| = δ uniformly, so ρ(P, Q) over nearby pairs is small but the
    1-d estimator with consecutive ratios sees ~0 — instead compare against
    a contraction difference: kernels with different ρ."""
    p = _gauss_kernel_sampler(0.9, 0.3)
    q = _gauss_kernel_sampler(0.5, 0.3)
    X = jnp.linspace(-2, 2, 16)[:, None]
    rho_d, _, _ = compute_kernel_distance(
        p, q, jax.random.PRNGKey(6), X,
        sample_batch_size=256, n_train_batches=2, n_eval_batches=16,
        max_steps=60,
    )
    # |Pf - Qf| with f=id is 0.4|x|; max over the quantile band of pairs
    # normalized by pair distance should be clearly nonzero
    assert float(rho_d) > 0.1


def test_kernel_distance_1d_runs():
    p = _gauss_kernel_sampler(0.9, 0.3)
    q = _gauss_kernel_sampler(0.5, 0.3)
    x = jnp.linspace(-2, 2, 12)
    rho_d, _, params = compute_kernel_distance_1d(
        p, q, jax.random.PRNGKey(7), x,
        sample_batch_size=512, n_train_batches=1, n_eval_batches=8,
        max_steps=30,
    )
    assert jnp.isfinite(rho_d)
    assert float(rho_d) >= 0.0


def _ar1_kernel(rho, sigma):
    """Minimal framework-shaped kernel with analytically known contraction:
    x' = ρx + σN(0,1) has τ(P) = |ρ| exactly (and τ(P^n) = |ρ|^n), in ANY
    probe parameterization — W(P(x,·), P(y,·)) = |ρ||x−y|."""
    import dataclasses
    from typing import NamedTuple

    import jax

    class S(NamedTuple):
        i: jax.Array
        position: jax.Array
        adapt_state: object
        rng_key: jax.Array

    def init(rng_key, n_chains, position=None, adapt_state=None):
        keys = jax.random.split(rng_key, n_chains)
        return S(jnp.zeros((), jnp.int32), position, adapt_state, keys)

    def step(s):
        sub, keys = jax.vmap(lambda k: tuple(jax.random.split(k)))(s.rng_key)
        noise = jax.vmap(lambda k: jax.random.normal(k, s.position.shape[1:]))(sub)
        return S(s.i + 1, rho * s.position + sigma * noise, s.adapt_state, keys)

    @dataclasses.dataclass(frozen=True)
    class Cfg:
        pass

    from adaptive_mcmc_tpu.kernels.base import Kernel
    return Kernel(name="ar1", target=None, config=Cfg(), init=init, step=step)


def test_arctan_taus_analytic_ar1():
    """The arctan-reparameterized finite-difference estimator
    (analysis.contraction_curves.taus_finite_difference_arctan) must
    recover τ(P^n) = ρ^n on the analytic AR(1) family — the ASSS-side
    analog of the ARWMH AR(1) validation above."""
    from adaptive_mcmc_tpu.analysis.contraction_curves import (
        taus_finite_difference_arctan,
    )
    from adaptive_mcmc_tpu.kernels.asss import ASSSAdaptState

    rho = 0.8
    k = _ar1_kernel(rho, sigma=0.5)
    adapt = ASSSAdaptState(loc=jnp.zeros((1, 1)), scale=jnp.eye(1)[None])
    xs = jnp.tan(jnp.linspace(-jnp.arctan(2.0), jnp.arctan(2.0), 7))
    for n in (1, 3):
        taus = taus_finite_difference_arctan(
            k, jax.random.PRNGKey(0), xs, adapt,
            n_steps=n, n_samples=2000,
        )
        np.testing.assert_allclose(np.asarray(taus), rho**n, rtol=0.05)


def test_asss_arctan_taus_below_one_and_decay():
    """Frozen well-adapted ASSS on N(0,1): τ(P^n) < 1 and decreasing in n
    (reference's visual check, asumptions_check cells 84-96)."""
    from adaptive_mcmc_tpu import asss, models
    from adaptive_mcmc_tpu.analysis.contraction_curves import (
        taus_finite_difference_arctan,
    )
    from adaptive_mcmc_tpu.kernels.asss import ASSSAdaptState, ASSSConfig

    target = models.std_normal(1)
    k = asss(target, ASSSConfig(adapt=False))
    adapt = ASSSAdaptState(loc=jnp.zeros((1, 1)), scale=jnp.eye(1)[None])
    xs = jnp.tan(jnp.linspace(-jnp.arctan(2.0), jnp.arctan(2.0), 9))
    t1 = taus_finite_difference_arctan(
        k, jax.random.PRNGKey(1), xs, adapt, n_steps=1, n_samples=4000
    )
    t6 = taus_finite_difference_arctan(
        k, jax.random.PRNGKey(1), xs, adapt, n_steps=6, n_samples=4000
    )
    assert float(jnp.max(t1)) < 1.0
    assert float(jnp.max(t6)) < float(jnp.max(t1))
