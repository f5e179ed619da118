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
    max_steps_per_call: int | None = None,
):
    """Run 10^n_pow iterations collecting the full state pytree on the log
    grid.  Returns a state-pytree whose leaves have a leading axis of
    len(ns_logscale(n_pow)) (then chains).

    ``max_steps_per_call`` bounds the kernel steps inside one device
    program: a 10^6-step single execution can run for minutes on slow
    kernels (diamonds ASSS) and trip the device watchdog (same failure
    mode documented at parallel/run.py::run_mcmc_sharded).  Segments are
    re-entered from the host with the state threaded through; the collected
    grid is identical."""
    from functools import partial

    step_n = getattr(kernel, "step_n", None)

    def _segment(state, thin, length):
        def body(s, _):
            if step_n is not None:
                s = step_n(s, thin)
            else:
                s = lax.fori_loop(0, thin, lambda _, t: kernel.step(t), s)
            return s, s

        return lax.scan(body, state, None, length=length)

    segment = (
        partial(jax.jit, static_argnames=("thin", "length"))(_segment)
        if jit
        else _segment
    )
    init = jax.jit(kernel.init, static_argnames=("n_chains",)) if jit else kernel.init
    state = init(rng_key, n_chains=n_chains, position=init_position)
    collections = []
    for p in range(n_pow + 1):
        lower = 0 if p < 1 else 10 ** (p - 1)
        upper = 10**p
        thin = 10 ** max(0, p - 2)
        total_len = (upper - lower) // thin
        chunk_len = (
            total_len
            if max_steps_per_call is None
            else max(1, min(total_len, max_steps_per_call // thin))
        )
        off = 0
        while off < total_len:
            length = min(chunk_len, total_len - off)
            state, coll = segment(state, thin=thin, length=length)
            collections.append(coll)
            off += length
    return concat_trees(collections), state
