"""Wasserstein-algorithm benchmark (reference compare_wasserstein.py).

Times the metric algorithms over n x d subsets of two sample sets and
writes a CSV: exact 1-1 coupling (native Hungarian / SciPy), on-device
epsilon-auction, Sinkhorn at several epsilons, max-sliced with 100/10k
directions, moment RMSE, and MMD.  Reference timings for n=1000, d=10 on
the author's laptop are in BASELINE.md ("Metric-computation runtimes") —
this script produces the comparable table for TPU + this host.

Run: python -m adaptive_mcmc_tpu.experiments.compare_wasserstein [out.csv]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu.metrics import (
    max_sliced_wasserstein,
    mmd_heuristic,
    pth_moment_rmse,
    wasserstein_dist11_p,
    wasserstein_sinkhorn,
)


def _example_clouds(n: int, d: int, seed: int = 0):
    """Synthetic stand-in for the reference's checked-in diamonds sample
    pickles: two correlated Gaussian clouds with a mean offset."""
    rng = np.random.default_rng(seed)
    mix = rng.standard_normal((d, d)) * 0.3 + np.eye(d)
    x = rng.standard_normal((n, d)) @ mix
    y = rng.standard_normal((n, d)) @ mix + 0.1
    return jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)


def _timed(fn, *args, repeats: int = 1, **kw):
    fn(*args, **kw)  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args, **kw)
        jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
    return (time.perf_counter() - t0) / repeats, out


def run(ns=(30, 100, 300, 1000, 3000), ds=(5, 10, 25), out_csv=None):
    rows = []
    for d in ds:
        for n in ns:
            x, y = _example_clouds(n, d)
            algos = {
                "hungarian": lambda: wasserstein_dist11_p(x, y),
                "auction": lambda: wasserstein_dist11_p(x, y, solver="auction"),
                "sinkhorn_default": lambda: wasserstein_sinkhorn(x, y),
                "sinkhorn_eps1e-2": lambda: wasserstein_sinkhorn(
                    x, y, epsilon=1e-2
                ),
                "sinkhorn_eps1e-3": lambda: wasserstein_sinkhorn(
                    x, y, epsilon=1e-3, max_iters=5000
                ),
                "max_sliced_100": lambda: max_sliced_wasserstein(
                    x, y, jax.random.PRNGKey(0), n_directions=100
                ),
                "max_sliced_10000": lambda: max_sliced_wasserstein(
                    x, y, jax.random.PRNGKey(0), n_directions=10_000
                ),
                "moment_rmse": lambda: pth_moment_rmse(x, y),
                "mmd_heuristic": lambda: mmd_heuristic(x, y),
            }
            for name, fn in algos.items():
                try:
                    dt, val = _timed(fn)
                except Exception as e:  # pragma: no cover
                    dt, val = float("nan"), float("nan")
                    print(f"[warn] {name} n={n} d={d}: {e}", file=sys.stderr)
                rows.append(
                    {
                        "algorithm": name,
                        "n": n,
                        "d": d,
                        "seconds": dt,
                        "value": float(val),
                    }
                )
                print(
                    f"{name:>18} n={n:<5} d={d:<3} "
                    f"{dt*1e3:9.1f} ms  value={float(val):.4f}",
                    flush=True,
                )
    import pandas as pd

    df = pd.DataFrame.from_records(rows)
    if out_csv:
        df.to_csv(out_csv, index=False)
        print(f"written {out_csv}")
    return df


if __name__ == "__main__":
    run(out_csv=sys.argv[1] if len(sys.argv) > 1 else None)
