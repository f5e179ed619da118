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
