"""Checkpoint / resume for kernel-state pytrees.

The reference's resilience story is 'pickle the whole MCMC object at the
end' plus skip-if-output-exists restartability of seed sweeps
(run_diamonds_lr_decay.py:55-68).  Here the full kernel state namedtuple IS
the checkpoint (it contains everything needed to resume: position, PE,
adapt state, RNG keys, iteration counter), saved as a flat .npz with the
pytree structure recorded — no pickle, host-portable, mesh-agnostic
(arrays are gathered to host on save and re-sharded by the runner on
restore)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_state(path: str | Path, state: Any) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez_compressed(path, __treedef__=str(treedef), **arrays)


def load_state(path: str | Path, like: Any) -> Any:
    """Restore a state saved by :func:`save_state`.  ``like`` supplies the
    pytree structure (e.g. a freshly built init state with the same
    config)."""
    with np.load(Path(path), allow_pickle=False) as data:
        _, treedef = jax.tree_util.tree_flatten(like)
        n = treedef.num_leaves
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class SweepManifest:
    """Per-item restartability for seed sweeps (the reference's
    skip-if-file-exists guard, generalized): records completed work units
    in a JSON manifest so interrupted sweeps resume where they stopped."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._done = set()
        if self.path.exists():
            self._done = set(json.loads(self.path.read_text()))

    def is_done(self, key: str) -> bool:
        return key in self._done

    def mark_done(self, key: str) -> None:
        self._done.add(key)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(sorted(self._done)))
