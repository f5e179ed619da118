"""1-D and sliced Wasserstein distances (evaluation.py:130-196).

Sort-based 1-D W_p is embarrassingly vectorizable, so the max-sliced variant
is one (n_directions, d) @ (d, n) projection matmul (MXU) followed by a
batched sort — the whole metric is a single fused XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("p",))
def wasserstein_1d(mu: jax.Array, nu: jax.Array, p: float = 1.0) -> jax.Array:
    """Closed-form 1-D W_p between equal-size empirical measures via
    sort-and-difference; batched over leading axes."""
    diff = jnp.abs(jnp.sort(mu, axis=-1) - jnp.sort(nu, axis=-1))
    return jnp.mean(diff**p, axis=-1) ** (1.0 / p)


@partial(jax.jit, static_argnames=("p", "n_directions"))
def max_sliced_wasserstein(
    mu: jax.Array,
    nu: jax.Array,
    rng_key: jax.Array,
    p: float = 1.0,
    n_directions: int = 1000,
) -> jax.Array:
    """max over random unit directions of the 1-D W_p of the projections.

    TPU shape: both projections are one matmul each — (n, d) @ (d, D) —
    then one batched sort over the direction axis.
    """
    d = mu.shape[1]
    dirs = jax.random.normal(rng_key, (n_directions, d))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    hi = jax.lax.Precision.HIGHEST  # bf16-pass default shifts projections
    proj_mu = jnp.matmul(mu, dirs.T, precision=hi)  # (n, D)
    proj_nu = jnp.matmul(nu, dirs.T, precision=hi)
    w = wasserstein_1d(proj_mu.T, proj_nu.T, p=p)  # (D,)
    return jnp.max(w)


@partial(jax.jit, static_argnames=("p", "n_directions"))
def sliced_wasserstein(
    mu: jax.Array,
    nu: jax.Array,
    rng_key: jax.Array,
    p: float = 1.0,
    n_directions: int = 1000,
) -> jax.Array:
    """Mean (rather than max) over directions — the standard SW distance;
    cheaper-variance companion to :func:`max_sliced_wasserstein`."""
    d = mu.shape[1]
    dirs = jax.random.normal(rng_key, (n_directions, d))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    hi = jax.lax.Precision.HIGHEST
    w = wasserstein_1d(
        jnp.matmul(mu, dirs.T, precision=hi).T,
        jnp.matmul(nu, dirs.T, precision=hi).T,
        p=p,
    )
    return jnp.mean(w**p) ** (1.0 / p)
