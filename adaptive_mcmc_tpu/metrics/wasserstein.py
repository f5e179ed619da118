"""Exact Wasserstein via optimal 1-1 coupling — the primary eval metric
(evaluation.py:42-66).

Pipeline: the (n, n) Minkowski-``ord`` cost matrix is built on device (one
matmul for ord=2), the assignment is solved by the exact native/SciPy
Hungarian backend (host — augmenting paths don't vectorize) or the
on-device ε-auction, and the reported value is the mean assigned distance,
matching the reference's convention exactly."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu.metrics.assignment import (
    auction_assignment,
    linear_sum_assignment,
)


def minkowski_cost_matrix(u: jax.Array, v: jax.Array, ord: float = 2.0):
    """Pairwise Minkowski-``ord`` distances (n, m).  ord=2 uses the Gram
    trick (one MXU matmul); other orders fall back to broadcasting."""
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    if ord == 2.0:
        uu = jnp.sum(u * u, axis=1)
        vv = jnp.sum(v * v, axis=1)
        # HIGHEST: the TPU default runs f32 matmuls through bf16 passes,
        # which perturbs distances by ~4e-4 relative — visible at the
        # 1e-3 precision the W tables are reported to.
        gram = jnp.matmul(u, v.T, precision=jax.lax.Precision.HIGHEST)
        sq = jnp.maximum(uu[:, None] + vv[None, :] - 2.0 * gram, 0.0)
        return jnp.sqrt(sq)
    diff = jnp.abs(u[:, None, :] - v[None, :, :])
    return jnp.sum(diff**ord, axis=-1) ** (1.0 / ord)


def wasserstein_dist11_p(
    u_values,
    v_values,
    ord: float = 2.0,
    solver: str = "auto",
    prices_init=None,
    return_prices: bool = False,
):
    """Mean distance under the optimal 1-1 coupling between two equal-size
    sample sets (reference wasserstein_dist11_p).  ``solver``: "auto" |
    "native" | "scipy" (exact, host) or "auction" (ε-approximate, device).

    For the auction solver, ``prices_init``/``return_prices`` expose the
    column duals so sweeps over many sample sets vs one fixed reference
    set can warm-start consecutive solves (see auction_assignment)."""
    cost = minkowski_cost_matrix(u_values, v_values, ord=ord)
    n = cost.shape[0]
    if solver == "auction":
        out = auction_assignment(
            cost, prices_init=prices_init, return_prices=return_prices
        )
        col, prices = out if return_prices else (out, None)
        w = float(jnp.mean(cost[jnp.arange(n), col]))
        return (w, prices) if return_prices else w
    cost_np = np.asarray(cost)
    col = linear_sum_assignment(cost_np, solver=solver)
    return float(cost_np[np.arange(n), col].mean())
