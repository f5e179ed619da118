"""Checkpointed long-run driver: chunked sampling with resumable state.

The reference's only resilience is skip-if-output-exists restartability of
whole runs (run_diamonds_lr_decay.py:55-56).  Here long runs stream
through fixed-size chunks; after each chunk the full kernel state (THE
checkpoint — position, PE, adaptation, RNG keys, iteration counter) is
written atomically, and :func:`run_mcmc_checkpointed` resumes mid-run from
the newest checkpoint after an interruption.  An optional per-chunk health
check (chain-finiteness, the ``jax.debug_nans`` analog compatible with the
kernels' intentional NaN→inf guards) aborts early with a diagnosis instead
of silently producing garbage trajectories.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu.infer.mcmc import run_mcmc
from adaptive_mcmc_tpu.utils.checkpoint import load_state, save_state

Array = jax.Array


class ChainHealthError(RuntimeError):
    pass


def check_chain_health(state, *, max_bad_frac: float = 0.0):
    """Raise if chains have gone numerically bad: non-finite positions or
    a fraction of +inf potential energies above ``max_bad_frac``."""
    pos_ok = bool(jnp.all(jnp.isfinite(state.position)))
    pe = state.potential_energy
    bad_frac = float(jnp.mean(~jnp.isfinite(pe)))
    if not pos_ok:
        raise ChainHealthError("non-finite chain positions detected")
    if bad_frac > max_bad_frac:
        raise ChainHealthError(
            f"{bad_frac:.1%} of chains have non-finite potential energy"
        )


def run_mcmc_checkpointed(
    kernel,
    rng_key: Array,
    num_warmup: int,
    num_samples: int,
    *,
    thinning: int = 1,
    n_chains: int = 1,
    checkpoint_dir: str | Path,
    chunk_size: int = 100_000,
    extra_fields: Sequence[str] = (),
    init_position: Optional[Array] = None,
    health_check: bool = True,
    verbose: bool = False,
):
    """Like ``run_mcmc`` but resumable: work proceeds in chunks of
    ``chunk_size`` post-warmup iterations; after each chunk the kernel
    state and collected draws are persisted.  Re-invoking with the same
    ``checkpoint_dir`` resumes after the last completed chunk."""
    ckpt_dir = Path(checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    meta_path = ckpt_dir / "progress.json"
    state_path = ckpt_dir / "state.npz"

    chunk_size = (max(chunk_size, thinning) // thinning) * thinning
    done_iters = 0
    state = None
    if meta_path.exists() and state_path.exists():
        meta = json.loads(meta_path.read_text())
        done_iters = meta["done_iters"]
        template = kernel.init(jax.random.PRNGKey(0), n_chains=n_chains)
        state = load_state(state_path, template)
        state = jax.tree.map(jnp.asarray, state)
        if verbose:
            print(f"[resume] {done_iters}/{num_samples} iterations done")

    if state is None:
        state = kernel.init(rng_key, n_chains=n_chains, position=init_position)
        if num_warmup:
            state = jax.jit(
                lambda s: jax.lax.fori_loop(
                    0, num_warmup, lambda _, x: kernel.step(x), s
                )
            )(state)
        if health_check:
            check_chain_health(state, max_bad_frac=0.05)

    while done_iters < num_samples:
        todo = min(chunk_size, num_samples - done_iters)
        samples, extras, state = run_mcmc(
            kernel, rng_key, 0, todo, thinning=thinning,
            n_chains=n_chains, extra_fields=extra_fields, init_state=state,
        )
        jax.block_until_ready(samples)
        if health_check:
            check_chain_health(state, max_bad_frac=0.05)
        chunk_idx = done_iters // chunk_size
        np.savez_compressed(
            ckpt_dir / f"chunk_{chunk_idx:05d}.npz",
            samples=np.asarray(samples),
            **{k: np.asarray(v) for k, v in extras.items()},
        )
        save_state(state_path, state)
        done_iters += todo
        meta_path.write_text(json.dumps({"done_iters": done_iters}))
        if verbose:
            print(f"[chunk] {done_iters}/{num_samples}")

    # stitch chunks
    chunks = sorted(ckpt_dir.glob("chunk_*.npz"))
    samples = np.concatenate(
        [np.load(c)["samples"] for c in chunks], axis=0
    )
    extras_out = {}
    for f in extra_fields:
        extras_out[f] = np.concatenate(
            [np.load(c)[f] for c in chunks], axis=0
        )
    return samples, extras_out, state
