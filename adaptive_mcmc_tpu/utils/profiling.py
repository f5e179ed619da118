"""Lightweight observability: phase timers + jax.profiler integration.

The reference's only timing instrumentation is %%time cells and manual
time.time() deltas (compare_wasserstein.py:26-29).  Here every runner can
wrap phases in :class:`PhaseTimer` (wall clock with device sync) and a
``trace`` context that emits a TensorBoard-viewable XLA trace."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase, syncing the device so the
    numbers mean what they say under async dispatch."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        (jax.device_put(0.0) + 0).block_until_ready()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            (jax.device_put(0.0) + 0).block_until_ready()
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.3f}s" for k, v in self.totals.items())


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """XLA profiler trace (view in TensorBoard / xprof)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def format_rate(iters: int, chains: int, seconds: float) -> str:
    total = iters * chains
    return (
        f"{total / seconds:,.0f} chain-iters/s "
        f"({iters / seconds:,.0f} it/s x {chains} chains)"
    )
