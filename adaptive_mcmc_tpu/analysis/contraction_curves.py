"""Finite-difference contraction estimates τ_x(P^n) on 1-D targets.

Rebuild of the notebook's ``get_taus_n`` construction
(asumptions_check.ipynb cells 30-31): for probe points x and a small
offset h, τ_x(P^n) ≈ W_1(P^n(x,·), P^n(x+h,·)) / h with the closed-form
1-D Wasserstein — the cheap companion to the Lipschitz-NN estimator
(contraction/lipschitz.py), and the producer of the contraction-vs-n decay
curves."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adaptive_mcmc_tpu.infer.mcmc import sample_pnx
from adaptive_mcmc_tpu.metrics.sliced import wasserstein_1d

Array = jax.Array


def taus_finite_difference(
    kernel,
    rng_key: Array,
    xs: Array,
    adapt_state,
    *,
    n_steps: int = 1,
    n_samples: int = 10_000,
    h: float = 1e-2,
    p: float = 1.0,
) -> Array:
    """τ_x(P^n) for each probe x in 1-D: pairs (x, x+h) are rolled forward
    with common random numbers and compared with closed-form W_p."""
    xs = jnp.asarray(xs).reshape(-1)
    # Two calls with the SAME rng_key and shapes -> identical per-chain key
    # grids -> the x and x+h rollouts are coupled (common random numbers).
    # Without coupling the W_1 Monte-Carlo noise floor (~m^-1/2) divided by
    # the small h swamps the contraction signal.
    a = sample_pnx(
        kernel, rng_key, xs[:, None], adapt_state,
        n=n_steps, n_samples=n_samples,
    )[:, :, 0]
    b = sample_pnx(
        kernel, rng_key, xs[:, None] + h, adapt_state,
        n=n_steps, n_samples=n_samples,
    )[:, :, 0]
    return wasserstein_1d(a, b, p=p) / h


def taus_finite_difference_arctan(
    kernel,
    rng_key: Array,
    xs: Array,
    adapt_state,
    *,
    n_steps: int = 1,
    n_samples: int = 10_000,
    eps: float = 1e-1,
    p: float = 1.0,
) -> Array:
    """ASSS-specific τ probes (asumptions_check.ipynb cell 82,
    ``get_taus_n_sss``): perturb in the stereographic angle
    φ = 2·arctan((x − loc)/scale) instead of x itself, map back to x space,
    and divide W_1 by the induced |Δx|.  Additive x-offsets degenerate in
    the tails the sphere compactifies (Δφ → 0 as |x| → ∞); angle offsets
    keep probe pairs equally well-conditioned everywhere on the circle."""
    xs = jnp.asarray(xs).reshape(-1)
    loc = jnp.asarray(adapt_state.loc).reshape(-1)[0]
    scale = jnp.asarray(adapt_state.scale).reshape(-1)[0]
    phi = 2.0 * jnp.arctan((xs - loc) / scale)
    x_l = jnp.tan((phi - eps) / 2.0) * scale + loc
    x_r = jnp.tan((phi + eps) / 2.0) * scale + loc
    # Same key for both rollouts -> common random numbers (see above).
    a = sample_pnx(
        kernel, rng_key, x_l[:, None], adapt_state,
        n=n_steps, n_samples=n_samples,
    )[:, :, 0]
    b = sample_pnx(
        kernel, rng_key, x_r[:, None], adapt_state,
        n=n_steps, n_samples=n_samples,
    )[:, :, 0]
    return wasserstein_1d(a, b, p=p) / (x_r - x_l)


def contraction_decay_curve(
    kernel,
    rng_key: Array,
    xs: Array,
    adapt_state,
    ns=(1, 2, 4, 8, 16, 32),
    taus_fn=taus_finite_difference,
    **kw,
) -> Array:
    """max_x τ_x(P^n) for each n — should fall below 1 and decrease
    (the reference's contraction sanity check, SURVEY §4).  ``taus_fn``
    selects the probe parameterization (additive for RWM-type kernels,
    :func:`taus_finite_difference_arctan` for ASSS)."""
    outs = []
    for i, n in enumerate(ns):
        key = jax.random.fold_in(rng_key, i)
        outs.append(
            jnp.max(
                taus_fn(kernel, key, xs, adapt_state, n_steps=int(n), **kw)
            )
        )
    return jnp.stack(outs)
