"""Instrument where auction_assignment_batch spends its time at the
w_eval shape (n=m=10k, B instances): per-chunk-call wall, eps level,
rounds spent, and unassigned-row counts.  Loads real draws from a saved
w_eval npz so the instances are the production ones.

Run:  python scripts/profile_auction_rounds.py [--npz PATH] [--batch 2]
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
    get_reference_draws,
)
from adaptive_mcmc_tpu.metrics.assignment import (  # noqa: E402
    _auction_chunk_batch,
)
from adaptive_mcmc_tpu.metrics.wasserstein import (  # noqa: E402
    minkowski_cost_matrix,
)


def instrumented_auction_batch(costs, eps_final=None, scaling_factor=10.0,
                               max_rounds=400_000, block=1024,
                               prices_init=None):
    costs = jnp.asarray(costs, jnp.float32)
    b, n, m = costs.shape
    rounds_per_call = max(256, (8_192 * 1_024) // (b * block))
    benefit = -costs
    rng = float(jnp.max(costs) - jnp.min(costs))
    if eps_final is None:
        eps_final = max(rng, 1e-6) / (2.0 * n)
    if prices_init is None:
        eps = max(rng / 2.0, eps_final)
        prices = jnp.zeros((b, m))
    else:
        eps = eps_final * scaling_factor
        p0 = jnp.asarray(prices_init, jnp.float32)
        reps = -(-b // p0.shape[0])
        prices = jnp.tile(p0, (reps, 1))[:b]
    block_small = max(32, min(block // 8, 128))
    lvl = 0
    t_total = 0.0
    while True:
        lvl += 1
        col_owner = jnp.full((b, m), -1, jnp.int32)
        row_to_col = jnp.full((b, n), -1, jnp.int32)
        spent = 0
        calls = 0
        t_lvl = time.perf_counter()
        while spent < max_rounds:
            left_v = np.asarray(jnp.sum(row_to_col < 0, axis=1))
            left = int(left_v.max())
            if left == 0:
                break
            if left > block_small:
                rounds = max(512, min(rounds_per_call, 8 * n // block))
                blk = block
            else:
                rounds = rounds_per_call
                blk = block_small
            t0 = time.perf_counter()
            prices, col_owner, row_to_col = _auction_chunk_batch(
                benefit, prices, col_owner, row_to_col,
                jnp.float32(eps), rounds, blk,
            )
            jax.block_until_ready(row_to_col)
            dt = time.perf_counter() - t0
            calls += 1
            print(f"  lvl {lvl} eps={eps:.3e} call {calls}: block={blk} "
                  f"rounds<={rounds} left_in={left_v.tolist()} "
                  f"wall={dt:.2f}s", flush=True)
            spent += rounds
        t_lvl = time.perf_counter() - t_lvl
        t_total += t_lvl
        print(f"LEVEL {lvl} eps={eps:.3e}: {calls} calls, "
              f"<= {spent} rounds, {t_lvl:.2f}s", flush=True)
        if eps <= eps_final:
            print(f"TOTAL {t_total:.2f}s")
            return row_to_col, prices
        eps = max(eps / scaling_factor, eps_final)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz",
                    default="mcmc_runs/w_eval/eight_schools/asss.npz")
    ap.add_argument("--target", default="eight_schools")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--warm", action="store_true",
                    help="ALSO run a second batch warm-started from the "
                         "first batch's duals (the production steady "
                         "state)")
    args = ap.parse_args()

    with np.load(args.npz, allow_pickle=False) as d:
        samples = d["samples"]
    ref = np.asarray(get_reference_draws(args.target))
    n = min(samples.shape[1], ref.shape[0])
    y = jnp.asarray(ref[:n])

    B = args.batch
    costs = jnp.stack([
        minkowski_cost_matrix(jnp.asarray(samples[s, :n]), y)
        for s in range(B)
    ])
    jax.block_until_ready(costs)
    print(f"profiling COLD batch: B={B} n={n}", flush=True)
    t0 = time.perf_counter()
    cols, prices = instrumented_auction_batch(costs)
    print(f"cold batch total {time.perf_counter()-t0:.2f}s")
    rows = jnp.arange(n)
    ws = [float(jnp.mean(costs[i, rows, cols[i]])) for i in range(B)]
    print("W:", ws)

    if args.warm:
        costs2 = jnp.stack([
            minkowski_cost_matrix(jnp.asarray(samples[B + s, :n]), y)
            for s in range(B)
        ])
        jax.block_until_ready(costs2)
        print(f"profiling WARM batch (prices carried)", flush=True)
        t0 = time.perf_counter()
        cols2, _ = instrumented_auction_batch(costs2, prices_init=prices)
        print(f"warm batch total {time.perf_counter()-t0:.2f}s")
        ws2 = [float(jnp.mean(costs2[i, rows, cols2[i]])) for i in range(B)]
        print("W:", ws2)


if __name__ == "__main__":
    main()
