"""End-to-end production-path timing of the batched exact-W auction at
the w_eval shape: one COLD batch and one WARM batch (duals carried),
using the real auction_assignment_batch.  Cross-checks W values against
the host Hungarian on the first seed.

Run:  python scripts/profile_auction_e2e.py [--batch 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/amt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from adaptive_mcmc_tpu.experiments.evaluate import (  # noqa: E402
    _wasserstein_worker,
    get_reference_draws,
)
from adaptive_mcmc_tpu.metrics.assignment import (  # noqa: E402
    auction_assignment_batch,
)
from adaptive_mcmc_tpu.metrics.wasserstein import (  # noqa: E402
    minkowski_cost_matrix,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz",
                    default="mcmc_runs/w_eval/eight_schools/asss.npz")
    ap.add_argument("--target", default="eight_schools")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--check", action="store_true",
                    help="Hungarian cross-check on seed 0 (slow: ~90 s)")
    args = ap.parse_args()

    with np.load(args.npz, allow_pickle=False) as d:
        samples = d["samples"]
    ref = np.asarray(get_reference_draws(args.target))
    n = min(samples.shape[1], ref.shape[0])
    y = jnp.asarray(ref[:n])
    rows = jnp.arange(n)
    B = args.batch

    def solve(s0, prices=None):
        t0 = time.perf_counter()
        costs = jnp.stack([
            minkowski_cost_matrix(jnp.asarray(samples[s, :n]), y)
            for s in range(s0, s0 + B)
        ])
        jax.block_until_ready(costs)
        t_cost = time.perf_counter() - t0
        t0 = time.perf_counter()
        cols, prices = auction_assignment_batch(
            costs, prices_init=prices, return_prices=True,
        )
        ws = [float(jnp.mean(costs[i, rows, cols[i]])) for i in range(B)]
        t_sol = time.perf_counter() - t0
        return ws, prices, t_cost, t_sol

    ws, prices, t_cost, t_sol = solve(0)
    print(f"COLD batch: cost-build {t_cost:.2f}s solve {t_sol:.2f}s")
    print("W:", [f"{w:.4f}" for w in ws])
    ws2, _, t_cost2, t_sol2 = solve(B, prices)
    print(f"WARM batch: cost-build {t_cost2:.2f}s solve {t_sol2:.2f}s")
    print("W:", [f"{w:.4f}" for w in ws2])

    if args.check:
        w_h = _wasserstein_worker(
            (np.asarray(samples[0], np.float64), np.asarray(ref, np.float64))
        )
        print(f"Hungarian seed0: {w_h:.6f} auction: {ws[0]:.6f} "
              f"diff {abs(ws[0]-w_h):.2e}")


if __name__ == "__main__":
    main()
