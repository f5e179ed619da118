"""Invariance (πP = π) as automated statistical tests — the reference's
visual checks (SURVEY §4.1) made quantitative — plus contraction decay."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_mcmc_tpu import ARWMHConfig, arwmh, asss, models
from adaptive_mcmc_tpu.analysis import (
    contraction_decay_curve,
    invariance_ks,
    ks_null_threshold,
    ks_statistic,
)
from adaptive_mcmc_tpu.analysis.figures import _frozen_arwmh


def _normal_sampler(key, n):
    return jax.random.normal(key, (n, 1))


def _mixture_sampler(key, n):
    k1, k2 = jax.random.split(key)
    comp = jax.random.bernoulli(k1, 0.5, (n, 1))
    return jnp.where(comp, 1.0, -1.0) + 0.1 * jax.random.normal(k2, (n, 1))


def test_ks_statistic_calibration():
    a = jax.random.normal(jax.random.PRNGKey(0), (20_000,))
    b = jax.random.normal(jax.random.PRNGKey(1), (20_000,))
    assert float(ks_statistic(a, b)) < ks_null_threshold(20_000)
    c = b + 0.2
    assert float(ks_statistic(a, c)) > ks_null_threshold(20_000)


@pytest.mark.parametrize("build", [arwmh, asss])
def test_invariance_normal(build):
    t = models.std_normal(1)
    ks = invariance_ks(
        build(t), _normal_sampler, jax.random.PRNGKey(2), n_samples=50_000
    )
    assert ks < 1.5 * ks_null_threshold(50_000), ks


def test_invariance_mixture_arwmh():
    t = models.gaussian_mixture_1d()
    ks = invariance_ks(
        arwmh(t), _mixture_sampler, jax.random.PRNGKey(3), n_samples=50_000
    )
    assert ks < 1.5 * ks_null_threshold(50_000), ks


def test_invariance_violated_for_wrong_target():
    """Negative control: pushing N(0,1) samples through a kernel targeting
    N(2,1) must FAIL the KS check."""
    t = models.mvn(jnp.array([2.0]), jnp.eye(1))
    ks = invariance_ks(
        arwmh(t), _normal_sampler, jax.random.PRNGKey(4), n_samples=20_000
    )
    assert ks > 3.0 * ks_null_threshold(20_000), ks


def test_contraction_decays_below_one():
    t = models.std_normal(1)
    k, adapt = _frozen_arwmh(t, step=1.0)
    taus = contraction_decay_curve(
        k, jax.random.PRNGKey(5), jnp.linspace(-2, 2, 5), adapt,
        ns=(1, 4, 16), n_samples=4000,
    )
    taus = np.asarray(taus)
    assert taus[0] < 1.0
    assert taus[-1] < taus[0]


def test_pe_offset_and_functional_convergence():
    from adaptive_mcmc_tpu.analysis import functional_convergence, pe_offset

    pes = jnp.array([1.0, 2.0, 3.0])
    off = float(pe_offset(pes))
    # -logsumexp(-pe) <= min(pe)
    assert off <= 1.0
    xs = jax.random.normal(jax.random.PRNGKey(0), (5000, 3))
    run = functional_convergence(xs, lambda x: jnp.min(x))
    # running estimate converges to E[min of 3 std normals] ~ -0.846
    assert abs(float(run[-1]) + 0.846) < 0.06
    assert run.shape == (5000,)


@pytest.mark.parametrize(
    "build", ["kidiq", "eight_schools_noncentered", "diamonds"]
)
def test_posterior_predictive_shapes(build):
    from adaptive_mcmc_tpu.analysis import posterior_predictive

    t = getattr(models, build)()
    x = jax.random.normal(jax.random.PRNGKey(1), (7, t.dim)) * 0.1
    rep = posterior_predictive(t, jax.random.PRNGKey(2), x)
    (name, arr), = rep.items()
    assert arr.shape[0] == 7
    assert bool(jnp.all(jnp.isfinite(arr)))
