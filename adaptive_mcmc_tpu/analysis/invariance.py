"""Invariance checks: πP = π, made quantitative.

The reference's closest thing to a kernel-correctness test is visual: push
10^6 exact samples through one kernel transition and overlay the histogram
on the target density (asumptions_check.ipynb cells 27-28, 78-79).  Here
the same construction is a *statistical test*: the pushed-forward sample is
compared to a fresh exact sample with a two-sample Kolmogorov-Smirnov
statistic (1-D) or energy-distance-style max-sliced comparison (n-D), so
CI can assert invariance with a fixed seed.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def push_through_kernel(
    kernel, rng_key: Array, exact_samples: Array, n_steps: int = 1,
    adapt_state=None,
) -> Array:
    """Apply ``n_steps`` kernel transitions (frozen adaptation) to a batch
    of exact samples.  Returns the pushed-forward batch (same shape)."""
    from adaptive_mcmc_tpu.infer.mcmc import sample_pnx

    n = exact_samples.shape[0]
    if adapt_state is None:
        st = kernel.init(
            jax.random.PRNGKey(0), n_chains=1,
            position=jnp.zeros((1, kernel.target.dim)),
        )
        adapt_state = st.adapt_state
    out = sample_pnx(
        kernel, rng_key, exact_samples, adapt_state,
        n=n_steps, n_samples=1,
    )
    return out[:, 0, :]


def ks_statistic(a: Array, b: Array) -> Array:
    """Two-sample KS statistic for 1-D samples (exact, sort-based)."""
    a = jnp.sort(a.reshape(-1))
    b = jnp.sort(b.reshape(-1))
    n, m = a.shape[0], b.shape[0]
    all_v = jnp.concatenate([a, b])
    cdf_a = jnp.searchsorted(a, all_v, side="right") / n
    cdf_b = jnp.searchsorted(b, all_v, side="right") / m
    return jnp.max(jnp.abs(cdf_a - cdf_b))


def invariance_ks(
    kernel,
    exact_sampler: Callable[[Array, int], Array],
    rng_key: Array,
    n_samples: int = 100_000,
    n_steps: int = 1,
    adapt_state=None,
) -> float:
    """KS statistic between (exact sample pushed through P^n_steps) and an
    independent exact sample.  Under πP = π this is the null two-sample
    KS, whose 99.9%-quantile is ~1.95·sqrt(2/n)."""
    k1, k2, k3 = jax.random.split(rng_key, 3)
    x = exact_sampler(k1, n_samples)
    if x.ndim == 1:
        x = x[:, None]
    pushed = push_through_kernel(kernel, k2, x, n_steps, adapt_state)
    y = exact_sampler(k3, n_samples)
    return float(ks_statistic(pushed[:, 0], y.reshape(-1, x.shape[1])[:, 0]))


def ks_null_threshold(n: int, alpha_sigma: float = 1.95) -> float:
    """Approximate upper bound for the two-sample KS stat under the null
    (both samples size n): c(α)·sqrt(2/n); 1.95 ≈ α=0.001."""
    return alpha_sigma * (2.0 / n) ** 0.5
