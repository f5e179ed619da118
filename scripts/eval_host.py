"""Host-side exact-Wasserstein eval worker for tie-dense targets.

The on-device ε-auction collapses on kidiq (d=4): 10k draws from a
4-dim posterior are saturated with near-ties, so v1−v2 bid increments
degenerate to ~ε and bidding wars run for minutes per seed.  The exact
host Hungarian (the reference's own solver, eval_kidiq_kidscore.py) is
~100 s/seed here — so this worker grinds those evals on the otherwise
idle host CPU while the main sweep keeps the TPU busy, writing results
to a side state file that scripts/merge_results.py folds into
RESULTS.md.

Run:  python scripts/eval_host.py --target kidiq [--kernels arwmh,asss,nuts]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adaptive_mcmc_tpu.experiments.evaluate import (  # noqa: E402
    evaluate_run,
    get_reference_draws,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="kidiq")
    ap.add_argument("--kernels", default="arwmh,asss,nuts")
    ap.add_argument("--out-dir", default="mcmc_runs")
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--poll", type=float, default=60.0,
                    help="seconds between checks for a missing run npz")
    args = ap.parse_args()

    out_dir = Path(args.out_dir)
    state_file = out_dir / f"results_state_{args.target}_host.json"
    results = (
        json.loads(state_file.read_text()) if state_file.exists() else {}
    )
    ref = get_reference_draws(
        args.target, 10_000, n_chains=256, num_warmup=3000, thinning=10,
        cache_dir=f"{args.out_dir}/reference_draws",
    )
    for kernel in args.kernels.split(","):
        key = f"{args.target}|{kernel}"
        if key in results:
            print(f"[skip] {key} already evaluated")
            continue
        npz = out_dir / "w_eval" / args.target / f"{kernel}.npz"
        manifest = out_dir / "w_eval" / args.target / "manifest.json"
        while True:
            done = (
                manifest.exists()
                and kernel in json.loads(manifest.read_text())
                and npz.exists()
            )
            if done:
                break
            print(f"[wait] {npz} not complete yet", flush=True)
            time.sleep(args.poll)
        with np.load(npz, allow_pickle=False) as data:
            meta = json.loads(str(data["meta"]))
        csv = npz.with_name(f"eval_{kernel}.csv")
        t0 = time.time()
        df = evaluate_run(
            npz, ref, csv,
            exact_wasserstein_seeds=args.seeds,
            exact_w_solver="host",
            sinkhorn=False,
            verbose=True,
        )
        results[key] = {
            "rmse_mean": float(df["rmse_means"].mean()),
            "rmse_std": float(df["rmse_means"].std()),
            "w_mean": float(df["wasserstein"].mean()),
            "w_std": float(df["wasserstein"].std()),
            "mmd_mean": float(df["mmd"].mean()),
            "mmd_std": float(df["mmd"].std()),
            "rate": meta["chain_iters_per_sec"],
            "wall": meta["wall_seconds"],
        }
        state_file.write_text(json.dumps(results))
        print(
            f"[eval-host] {key}: W={results[key]['w_mean']:.4f} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
