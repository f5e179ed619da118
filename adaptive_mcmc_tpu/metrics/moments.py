"""Moment-based sample-quality metrics (evaluation.py:13-39)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def pth_moment_rmse(x: jax.Array, y: jax.Array, p: float = 2.0) -> jax.Array:
    """L2 norm of the difference of p-th raw-moment estimates between two
    (n, d) sample sets — ``rmse_means`` of the eval scripts uses p=1
    (eval_eight_schools.py:75)."""
    mx = jnp.mean(x**p, axis=0)
    my = jnp.mean(y**p, axis=0)
    return jnp.linalg.norm(mx - my)
