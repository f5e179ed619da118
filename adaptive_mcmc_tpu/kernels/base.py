"""Shared kernel machinery.

Kernels in this framework are *pure batched transition functions*: a kernel
is a pair ``init(rng_key, n_chains, position) -> State`` /
``step(State) -> State`` where every per-chain leaf of ``State`` carries a
leading ``(chains,)`` axis and the iteration counter is a single scalar (all
chains step in lockstep inside one ``lax.scan``).  This replaces the
reference's NumPyro ``MCMCKernel`` OO protocol (arwmh.py:31-228) with the
shape XLA compiles best: one static-shape program, chains dense on the VPU/
MXU, devices added later by ``shard_map`` over a ``chains`` mesh axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Kernel:
    """A built sampler: pure init/step closures over (target, config)."""

    name: str
    target: Any
    config: Any
    init: Callable[..., Any]
    step: Callable[[Any], Any]
    # Optional extras (populated per kernel family):
    sample_field: str = "position"
    # Optional asynchronous multi-step driver ``step_n(state, n) -> state``:
    # advances EVERY chain by exactly ``n`` transitions without forcing
    # chains through data-dependent inner loops in lockstep (see
    # asss.py::step_n — shrinkage trips pipeline across chains).  Runners
    # use it instead of n× ``step`` when present.
    step_n: Any = None
    # Optional pipelined thinned-draw collector
    # ``collect_n(state, n_frames, thinning) -> (state, {field: (C, F, ...)})``:
    # advances every chain by ``n_frames*thinning`` transitions like
    # ``step_n`` and scatters each chain's every-``thinning``-th completed
    # position (plus per-kernel extras) into a preallocated buffer AS the
    # chain completes it.  This removes the per-frame max-over-chains sync
    # barrier a scan-of-step_n collect loop pays: chains record draws at
    # their own pace and only the call boundary synchronises.
    collect_n: Any = None
    # Field names ``collect_n`` buffers (runners fall back to the scan
    # collect loop when they need a field not listed here).
    collect_fields: tuple = ()
    # Optional diagnostics probe ``probe(state, n_steps) -> (state, info)``
    # exposing kernel-internal cost drivers (e.g. ASSS per-chain mean
    # shrinkage trips) without widening the production state.
    probe: Any = None


# ---------------------------------------------------------------------------
# Scatter-free pipelined thinned-draw recording (collect_n support).
#
# The obvious way to record per-chain thinned draws inside a pipelined
# driver — ``buf.at[arange(C), frame_idx].set(vals)`` — lowers to an XLA
# scatter, which the TPU backend executes as a serialized per-update loop:
# measured ~300 µs/iteration at C=1600, 3x the whole NUTS leapfrog body.
# Instead: each chain writes its completed frame into a small ring
# (C, RING, ...) with a one-hot masked select (dense, vectorizes on the
# VPU), and every iteration the newest frame that ALL chains have passed
# is flushed to the (C, F, ...) output with ONE scalar-index
# dynamic_update_slice (dense, in-place).  Chains more than RING-2 frames
# ahead of the slowest are frozen by the driver until the flush head
# catches up — they stall on the call-boundary barrier anyway, so bounded
# drift costs no wall-clock.
#
# Determinism note: with a body-unroll factor K=1 the freeze/resume is
# bitwise identical to the never-frozen step_n trajectory (each loop
# iteration materialises the carry, so a resumed chain recomputes from
# exactly the values it froze with).  With K>1 XLA fuses the unrolled
# bodies and the freeze select changes fusion/FMA contraction across the
# sub-body boundary, so resumed chains can pick up 1-ulp rounding
# differences — statistically identical, asserted so in the kernels'
# production-unroll tests.
# ---------------------------------------------------------------------------

RING = 8  # live ring window (usable drift: RING - 2 frames)


def recorder_init(n_chains: int, n_frames: int, field_shapes: dict):
    """(ring, out) buffer pytrees for ``field_shapes`` {name: trailing}."""
    ring = {
        k: jnp.zeros((n_chains, RING) + s) for k, s in field_shapes.items()
    }
    out = {
        k: jnp.zeros((n_chains, n_frames) + s)
        for k, s in field_shapes.items()
    }
    return ring, out


def recorder_init_cl(n_chains: int, n_frames: int, field_shapes: dict):
    """Chains-LAST (ring, out) buffers: ring (RING,)+s+(C,), out
    (F,)+s+(C,).  For drivers whose internal layout rides chains on the
    TPU lane axis (see kernels/nuts.py): the per-trip one-hot write then
    touches (RING, d, C) tiles with C on lanes instead of a (C, RING, d)
    block whose d-minor axis pads to 128 lanes."""
    ring = {
        k: jnp.zeros((RING,) + s + (n_chains,))
        for k, s in field_shapes.items()
    }
    out = {
        k: jnp.zeros((n_frames,) + s + (n_chains,))
        for k, s in field_shapes.items()
    }
    return ring, out


def recorder_write_cl(ring: dict, done_before: Array, done: Array,
                      thinning: int, values: dict) -> dict:
    """Chains-last twin of :func:`recorder_write`."""
    wrote = (done > done_before) & ((done % thinning) == 0)    # (C,)
    fi = done // thinning - 1
    oh = wrote[None, :] & (
        jnp.arange(RING)[:, None] == (fi % RING)[None, :]
    )  # (RING, C)
    new = {}
    for k, r in ring.items():
        m = oh.reshape((RING,) + (1,) * (r.ndim - 2) + oh.shape[1:])
        new[k] = jnp.where(m, values[k][None], r)
    return new


def recorder_flush_cl(ring: dict, out: dict, done: Array, thinning: int,
                      n_frames: int) -> dict:
    """Chains-last twin of :func:`recorder_flush`."""
    w = jnp.min(done) // thinning
    f = jnp.clip(w - 1, 0, max(n_frames - 1, 0))
    new = {}
    for k, r in ring.items():
        val = jax.lax.dynamic_index_in_dim(r, f % RING, axis=0)
        idx = (f,) + (0,) * (r.ndim - 1)
        new[k] = jax.lax.dynamic_update_slice(out[k], val, idx)
    return new


def recorder_drift_ok(done: Array, thinning: int) -> Array:
    """Chains may only run while their next frame write stays strictly
    inside the live ring window behind the flush head."""
    w_min = jnp.min(done) // thinning
    return done // thinning < w_min + (RING - 1)


def recorder_write(ring: dict, done_before: Array, done: Array,
                   thinning: int, values: dict) -> dict:
    """Record ``values`` for chains that just crossed a frame boundary
    (``done`` moves by at most 1 per call, so at most one boundary)."""
    wrote = (done > done_before) & ((done % thinning) == 0)
    fi = done // thinning - 1
    oh = wrote[:, None] & (
        jnp.arange(RING)[None, :] == (fi % RING)[:, None]
    )  # (C, RING)
    new = {}
    for k, r in ring.items():
        m = oh.reshape(oh.shape + (1,) * (r.ndim - 2))
        new[k] = jnp.where(m, values[k][:, None], r)
    return new


def recorder_flush(ring: dict, out: dict, done: Array, thinning: int,
                   n_frames: int) -> dict:
    """Flush the newest globally-complete frame (idempotent: the flush
    head advances by at most one frame per iteration and each frame is
    re-flushed until the head moves past it)."""
    w = jnp.min(done) // thinning
    f = jnp.clip(w - 1, 0, max(n_frames - 1, 0))
    new = {}
    for k, r in ring.items():
        val = jax.lax.dynamic_index_in_dim(r, f % RING, axis=1)  # (C,1)+s
        idx = (0, f) + (0,) * (r.ndim - 2)
        new[k] = jax.lax.dynamic_update_slice(out[k], val, idx)
    return new


def nan_to_inf(pe: Array) -> Array:
    """NaN potential -> +inf (reject), as in arwmh.py:171, asss.py:244."""
    return jnp.where(jnp.isnan(pe), jnp.inf, pe)


def split_keys(keys: Array, num: int):
    """Per-chain key splitting: ``keys`` has shape (C,) (typed) or (C, 2).

    Returns ``num`` arrays of per-chain subkeys, plus nothing else — callers
    unpack.  Uses one vmapped split so chain streams are independent and
    identical to running each chain alone with its own key.
    """
    subs = jax.vmap(lambda k: jax.random.split(k, num))(keys)  # (C, num, ...)
    return tuple(subs[:, i] for i in range(num))


def adaptation_lr(i: Array, num_warmup: int, lr_decay: float) -> tuple:
    """(n, gamma) with the reference's warmup-boundary reset (arwmh.py:180-183):
    the adaptation clock restarts after warmup."""
    itr = i + 1
    n = jnp.where(i < num_warmup, itr, itr - num_warmup)
    nf = n.astype(jnp.float32)
    gamma = nf ** (-lr_decay) if lr_decay != 1.0 else 1.0 / nf
    return n, gamma


def batch_positions(target, rng_key: Array, n_chains: int, position=None) -> Array:
    """Default per-chain init positions: uniform(-2, 2) in unconstrained
    space (init_to_uniform), or broadcast/validate a provided position."""
    if position is None:
        keys = jax.random.split(rng_key, n_chains)
        return jax.vmap(target.init_position)(keys)
    position = jnp.asarray(position, jnp.float32)
    if position.ndim == 1:
        position = jnp.broadcast_to(position, (n_chains, target.dim))
    assert position.shape == (n_chains, target.dim), position.shape
    return position
