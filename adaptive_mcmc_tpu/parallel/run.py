"""Sharded chain execution over a device mesh.

Two complementary mechanisms (both exercised by tests on a virtual 8-device
CPU mesh and by ``__graft_entry__.dryrun_multichip``):

1. :func:`run_mcmc_sharded` — the whole warmup+sample scan in ONE jit with a
   ``chains`` sharding constraint on the state.  Every kernel op is
   elementwise over chains, so GSPMD partitions the program with zero
   per-step collectives; each device runs its chain block independently at
   full speed and results come back as one global sharded array.

2. ``shard_map`` collectives for cross-chain reductions
   (:func:`cross_chain_moments`, :func:`sharded_gelman_rubin`) — explicit
   ``psum`` over the ``chains`` axis so pooled diagnostics ride ICI without
   gathering raw trajectories to any single device.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from adaptive_mcmc_tpu.parallel.mesh import (
    CHAIN_AXIS,
    chain_mesh,
    chain_sharding,
)

Array = jax.Array


def _constrain_chain_axis(state, mesh: Mesh, n_chains: int):
    shard = chain_sharding(mesh)

    def put(a):
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == n_chains:
            return lax.with_sharding_constraint(a, shard)
        return a

    return jax.tree.map(put, state)


def fan_state(state, fan: int):
    """Clone every chain ``fan`` times (clones contiguous per chain): each
    per-chain leaf (C, ...) tiles to (C*fan, ...) and the per-chain RNG
    keys are split so clones get independent streams.

    Statistical note: cloning a chain state and continuing with fresh keys
    preserves the chain's marginal distribution exactly — for kernels whose
    post-warmup transition is frozen (NUTS, SA after adaptation) the pooled
    clone draws are distributed identically to one long chain's.  For
    still-adapting kernels (ARWMH/ASSS diminishing adaptation) each clone
    runs its own post-warmup adaptation clock, so fanning trades a shorter
    per-clone adaptation tail for wall-clock — verify quality parity before
    adopting it for those."""
    C = state.rng_key.shape[0]

    def tile(a):
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == C:
            return jnp.repeat(a, fan, axis=0)
        return a

    new = jax.tree.map(tile, state)
    keys = jax.vmap(lambda k: jax.random.split(k, fan))(state.rng_key)
    keys = keys.reshape((C * fan,) + keys.shape[2:])
    return new._replace(rng_key=keys)


def run_mcmc_sharded(
    kernel,
    rng_key: Array,
    num_warmup: int,
    num_samples: int,
    *,
    thinning: int = 1,
    n_chains: int,
    mesh: Optional[Mesh] = None,
    init_position: Optional[Array] = None,
    extra_fields: Sequence[str] = (),
    init_state=None,
    max_steps_per_call: Optional[int] = None,
    fan_out: int = 1,
):
    """Chain-sharded version of ``infer.run_mcmc`` — same semantics, state
    split over the mesh's ``chains`` axis.  ``n_chains`` must divide by the
    mesh size.

    ``max_steps_per_call`` bounds the kernel steps executed inside one
    device program: very long single executions (minutes) can trip device
    watchdogs — observed with 110k-step NUTS scans on v5e — so long runs
    are split into multiple launches with the state threaded through.

    ``fan_out=F`` warms up ``n_chains`` chains, then clones each into F
    chains (:func:`fan_state`) and collects ``num_samples // F`` sampling
    iterations per clone — the total sampling work is unchanged but runs
    F-wide.  Collected arrays come back with a (..., n_chains*F, ...) chain
    axis, clone-major within each original chain."""
    mesh = mesh if mesh is not None else chain_mesh()
    n_dev = mesh.devices.size
    assert n_chains % n_dev == 0, (
        f"n_chains ({n_chains}) must be a multiple of the mesh size ({n_dev})"
    )
    assert num_samples % (thinning * fan_out) == 0, (
        "num_samples must divide by thinning * fan_out"
    )
    num_collect = num_samples // thinning // fan_out
    sample_field = kernel.sample_field

    @jax.jit
    def _init(rng_key, init_position):
        state = kernel.init(
            rng_key, n_chains=n_chains, position=init_position
        )
        return _constrain_chain_axis(state, mesh, n_chains)

    # Kernels with a pipelined multi-step driver (ASSS: shrinkage trips
    # interleave across chains) advance via step_n; others run the plain
    # lockstep fori of step.
    step_n = getattr(kernel, "step_n", None)
    # Kernels with a pipelined collector record thinned draws *inside* the
    # driver (one straggler barrier per call instead of per frame).
    collect_n = getattr(kernel, "collect_n", None)
    if collect_n is not None and not (
        {sample_field, *extra_fields}
        <= set(getattr(kernel, "collect_fields", ()))
    ):
        collect_n = None  # a requested field isn't buffered by the kernel

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("n_steps",))
    def _warm(state, n_steps):
        if step_n is not None:
            return step_n(state, n_steps)
        return lax.fori_loop(0, n_steps, lambda _, s: kernel.step(s), state)

    @_partial(jax.jit, static_argnames=("n_collect",))
    def _collect(state, n_collect):
        def body(state, _):
            if step_n is not None:
                state = step_n(state, thinning)
            else:
                state = lax.fori_loop(
                    0, thinning, lambda _, s: kernel.step(s), state
                )
            out = {sample_field: getattr(state, sample_field)}
            out.update({f: getattr(state, f) for f in extra_fields})
            return state, out

        return lax.scan(body, state, None, length=n_collect)

    state = init_state if init_state is not None else _init(
        rng_key, init_position
    )

    import os as _os
    import time as _time

    _trace = _os.environ.get("AMT_TRACE_PHASES")

    def _mark(tag, t0):
        if _trace:
            print(f"  [run_mcmc_sharded] {tag}: {_time.time() - t0:.1f}s",
                  flush=True)
        return _time.time()

    _t = _time.time()
    cap = max_steps_per_call or max(num_warmup + num_samples, 1)
    done = 0
    while done < num_warmup:
        todo = min(cap, num_warmup - done)
        state = _warm(state, todo)
        jax.block_until_ready(state.position)
        done += todo
        _t = _mark(f"warm {todo}", _t)

    if fan_out > 1:
        state = jax.jit(fan_state, static_argnames=("fan",))(
            state, fan=fan_out
        )
        state = jax.jit(
            lambda s: _constrain_chain_axis(s, mesh, n_chains * fan_out)
        )(state)

    frames_per_call = max(1, cap // thinning)
    chunks = []
    collected_frames = 0
    while collected_frames < num_collect:
        todo = min(frames_per_call, num_collect - collected_frames)
        if collect_n is not None:
            state, bufs = collect_n(state, n_frames=todo, thinning=thinning)
            # (C, F, ...) chain-paced buffers -> the scan layout (F, C, ...)
            out = {
                f: jnp.moveaxis(bufs[f], 0, 1)
                for f in (sample_field, *extra_fields)
            }
        else:
            state, out = _collect(state, todo)
        jax.block_until_ready(state.position)
        chunks.append(out)
        collected_frames += todo
        _t = _mark(f"collect {todo}", _t)
    if len(chunks) == 1:
        collected = chunks[0]
    else:
        collected = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *chunks
        )
    samples = collected.pop(sample_field)
    _t = _mark("merge+return", _t)
    return samples, collected, state


# ---------------------------------------------------------------------------
# Explicit collective diagnostics (psum over the chains mesh axis).
# ---------------------------------------------------------------------------

def cross_chain_moments(x: Array, mesh: Optional[Mesh] = None):
    """Global (mean, var) over the chain axis of a (C, ...) array without
    gathering: per-device partial sums + one psum each."""
    mesh = mesh if mesh is not None else chain_mesh()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(CHAIN_AXIS),
        out_specs=(P(), P()),
    )
    def _moments(xs):
        n = lax.psum(jnp.asarray(xs.shape[0], jnp.float32), CHAIN_AXIS)
        s = lax.psum(jnp.sum(xs, axis=0), CHAIN_AXIS)
        s2 = lax.psum(jnp.sum(xs * xs, axis=0), CHAIN_AXIS)
        mean = s / n
        var = s2 / n - mean * mean
        return mean, var

    return _moments(x)


def sharded_gelman_rubin(samples: Array, mesh: Optional[Mesh] = None):
    """Split-R̂ of (draws, chains, ...) samples with chains sharded: the
    per-chain means/vars are computed on the owning device, then reduced
    with psum — O(params) bytes over ICI instead of O(draws·chains)."""
    mesh = mesh if mesh is not None else chain_mesh()

    @partial(
        shard_map, mesh=mesh, in_specs=P(None, CHAIN_AXIS), out_specs=P()
    )
    def _rhat(x):
        half = x.shape[0] // 2
        x = jnp.concatenate([x[:half], x[half : 2 * half]], axis=1)
        n = x.shape[0]
        cm = jnp.mean(x, axis=0)
        cv = jnp.var(x, axis=0, ddof=1)
        m = lax.psum(jnp.asarray(x.shape[1], jnp.float32), CHAIN_AXIS)
        w = lax.psum(jnp.sum(cv, axis=0), CHAIN_AXIS) / m
        mean_all = lax.psum(jnp.sum(cm, axis=0), CHAIN_AXIS) / m
        b = n * lax.psum(
            jnp.sum((cm - mean_all) ** 2, axis=0), CHAIN_AXIS
        ) / (m - 1.0)
        var_hat = (n - 1) / n * w + b / n
        return jnp.sqrt(var_hat / w)

    return _rhat(samples)
