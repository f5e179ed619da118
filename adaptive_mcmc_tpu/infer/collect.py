"""Log-scale trajectory collection (lr-decay experiments).

Rebuild of the reference's second MCMC driver
(utils/kernel_utils.py:8-38): collect full kernel states on a log-spaced
iteration grid — at most 100 points per decade over 10^n_pow iterations —
including the ``as_change`` adaptation-drift diagnostic the lr-decay plots
are built from.

TPU-native difference: each decade is one ``lax.scan`` with static thinning
(the reference re-enters Python 7× per run via fori_collect; here the decade
loop is unrolled at trace time into a single jitted program).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def ns_logscale(n_pow: int = 6) -> Array:
    """Iteration indices of collected states: per-decade thinning
    10^max(0, p-2) (kernel_utils.py:8-12)."""
    chunks = []
    for p in range(n_pow + 1):
        lower = 0 if p < 1 else 10 ** (p - 1)
        thin = 10 ** max(0, p - 2)
        chunks.append(jnp.arange(lower, 10**p, thin) + thin)
    return jnp.concatenate(chunks)


def concat_trees(trees):
    """Leafwise concatenation of a list of state pytrees
    (kernel_utils.py:14-18)."""
    return jax.tree.map(lambda *ls: jnp.concatenate(ls), *trees)


def collect_states_logscale(
    kernel,
    rng_key: Array,
    *,
    n_pow: int = 6,
    n_chains: int = 1,
    init_position=None,
    jit: bool = True,
):
    """Run 10^n_pow iterations collecting the full state pytree on the log
    grid.  Returns a state-pytree whose leaves have a leading axis of
    len(ns_logscale(n_pow)) (then chains)."""

    def _run(rng_key, init_position):
        state = kernel.init(rng_key, n_chains=n_chains, position=init_position)
        collections = []
        for p in range(n_pow + 1):
            lower = 0 if p < 1 else 10 ** (p - 1)
            upper = 10**p
            thin = 10 ** max(0, p - 2)

            def body(s, _):
                s = lax.fori_loop(0, thin, lambda _, t: kernel.step(t), s)
                return s, s

            state, coll = lax.scan(
                body, state, None, length=(upper - lower) // thin
            )
            collections.append(coll)
        return concat_trees(collections), state

    if jit:
        _run = jax.jit(_run)
    return _run(rng_key, init_position)
