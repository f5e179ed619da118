"""Posterior-analysis utilities from the reference notebooks.

* :func:`pe_offset` — the potential-energy normalization constant
  pe_offset = −logsumexp(−PE(ref draws)) used to overlay PE traces across
  kernels (posteriordb_eight-schools.ipynb cell 24).
* :func:`functional_convergence` — running Monte-Carlo estimate of a
  functional φ(θ) vs draw count (the φ-estimator convergence plots,
  posteriordb_eight-schools.ipynb cells 59-60; e.g. φ = min_j θ_j).
* :func:`posterior_predictive` — y_rep draws given posterior samples
  (posteriordb_kidiq-kidscore.ipynb cells 77-79).
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax
import jax.numpy as jnp

Array = jax.Array


def pe_offset(potential_energies: Array) -> Array:
    """−logsumexp(−PE) over a set of reference draws: shifts PE traces so
    the best achievable value is comparable across targets."""
    return -jax.scipy.special.logsumexp(-jnp.asarray(potential_energies))


def functional_convergence(samples: Array, fn: Callable[[Array], Array]):
    """Running mean of φ(θ_i) over draws.  ``samples``: (n, d) in the order
    drawn; returns (n,) running estimates (use with ``ns_logscale`` indices
    for log-grid plots)."""
    vals = jax.vmap(fn)(samples)
    return jnp.cumsum(vals) / jnp.arange(1, vals.shape[0] + 1)


# -- per-target predictive samplers ----------------------------------------

def posterior_predictive(
    target, rng_key: Array, samples_unconstrained: Array
) -> Mapping[str, Array]:
    """Draw y_rep for each posterior draw.  Supported targets: kidiq,
    eight_schools_(non)centered, diamonds."""
    from adaptive_mcmc_tpu.models import data as _data

    name = target.name
    n = samples_unconstrained.shape[0]
    keys = jax.random.split(rng_key, n)
    sites = target.constrain(samples_unconstrained)

    if name == "kidiq":
        d = _data.kidiq()
        X = jnp.stack(
            [
                jnp.ones_like(jnp.asarray(d["mom_hs"])),
                jnp.asarray(d["mom_hs"]),
                jnp.asarray(d["mom_iq"]),
            ],
            axis=1,
        )

        def rep(key, beta, sigma):
            mu = X @ beta
            return mu + sigma * jax.random.normal(key, mu.shape)

        return {
            "kid_score_rep": jax.vmap(rep)(keys, sites["beta"], sites["sigma"])
        }

    if name.startswith("eight_schools"):
        d = _data.eight_schools()
        sigma_obs = jnp.asarray(d["sigma"])
        if "theta_base" in sites:
            theta = (
                sites["mu"][:, None]
                + sites["tau"][:, None] * sites["theta_base"]
            )
        else:
            theta = sites["theta"]

        def rep(key, th):
            return th + sigma_obs * jax.random.normal(key, th.shape)

        return {"y_rep": jax.vmap(rep)(keys, theta)}

    if name == "diamonds":
        d = _data.diamonds()
        X = jnp.asarray(d["X"])
        Xc = X[:, 1:] - jnp.mean(X[:, 1:], axis=0, keepdims=True)

        def rep(key, intercept, b, sigma):
            mu = intercept + Xc @ b
            return mu + sigma * jax.random.normal(key, mu.shape)

        return {
            "Y_rep": jax.vmap(rep)(
                keys, sites["Intercept"], sites["b"], sites["sigma"]
            )
        }

    raise ValueError(f"no predictive sampler for target {name!r}")
