"""Regenerate w_eval cells with the current (pipelined) driver and
re-evaluate them, unifying draw/wall provenance (VERDICT r2 weak #3).

Round 2 left the eight_schools asss/nuts eval rows grading lockstep-driver
draws while the wall columns came from pipelined step_n re-runs.  This
script makes each cell single-run consistent again:

  pass 1 (cold)  — fresh npz from the production driver; wall includes
                   the one-time program-load/compile cost over the axon
                   tunnel (what a one-shot user pays)
  pass 2 (warm)  — identical re-run in-process; steady-state wall (what a
                   resident service pays).  Draws asserted bitwise equal
                   to pass 1 (the driver is deterministic per process).
  eval           — metric rows computed from exactly these draws.

results_state.json gains a ``wall_cold`` field next to the (warm) wall.

Run:  python scripts/regen_cells.py [--cells eight_schools/asss,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/amt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from adaptive_mcmc_tpu.experiments.configs import (  # noqa: E402
    RunConfig,
    W_EVAL_BUDGETS,
)
from adaptive_mcmc_tpu.experiments.evaluate import (  # noqa: E402
    evaluate_run,
    get_reference_draws,
)
from adaptive_mcmc_tpu.experiments.runner import run_w_eval  # noqa: E402
from adaptive_mcmc_tpu.utils.checkpoint import SweepManifest  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from run_full_sweeps import FAN_OUT  # noqa: E402


def _draws_sha1(npz_path: Path) -> str:
    """Fingerprint of the draws an eval row grades: sha1 over the raw
    samples bytes. Keys the eval-skip predicate to the artifact itself
    (VERDICT r4 weak #2: a committed state-file row must not skip the
    eval of freshly regenerated draws)."""
    import hashlib

    with np.load(npz_path, allow_pickle=False) as d:
        a = np.ascontiguousarray(d["samples"])
    return hashlib.sha1(a.tobytes()).hexdigest()


def _reset(out: Path, target: str, kernel: str):
    manifest = SweepManifest(out / "w_eval" / target / "manifest.json")
    manifest._done.discard(kernel)
    manifest.path.parent.mkdir(parents=True, exist_ok=True)
    manifest.path.write_text(json.dumps(sorted(manifest._done)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cells", default="eight_schools/asss,eight_schools/nuts",
    )
    ap.add_argument("--out-dir", default="mcmc_runs")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--force-sweep", action="store_true",
                    help="re-run the cold/warm sweep passes even when the "
                         "npz + both walls already exist")
    ap.add_argument("--force-eval", action="store_true",
                    help="re-run the eval even when the metric row exists")
    args = ap.parse_args()
    out = Path(args.out_dir)
    state_file = out / "results_state.json"
    results = (
        json.loads(state_file.read_text()) if state_file.exists() else {}
    )

    for cell in args.cells.split(","):
        target, kernel = cell.split("/")
        npz_path = out / "w_eval" / target / f"{kernel}.npz"
        budget = dict(W_EVAL_BUDGETS[(target, kernel)])
        fan = FAN_OUT.get(kernel, 1)
        n_draws = budget["num_samples"] // budget["thinning"]
        if n_draws % fan:
            fan = 1
        cfg = RunConfig(
            target=target, kernel=kernel, n_seeds=100,
            out_dir=args.out_dir, fan_out=fan, **budget,
        )
        key = f"{target}|{kernel}"
        entry = results.setdefault(key, {})
        have_sweep = (
            npz_path.exists()
            and entry.get("wall") is not None
            and entry.get("wall_cold") is not None
        )
        if have_sweep and not args.force_sweep:
            print(f"[{cell}] sweep passes already on disk "
                  f"(wall={entry['wall']:.1f}s cold={entry['wall_cold']:.1f}s"
                  f" driver={entry.get('driver')}); skipping to eval",
                  flush=True)
        else:
            passes = []
            for tag in ("cold", "warm"):
                _reset(out, target, kernel)
                t0 = time.time()
                run_w_eval(cfg, verbose=False)
                wall_outer = time.time() - t0
                with np.load(npz_path, allow_pickle=False) as d:
                    passes.append(
                        (d["samples"][:2].copy(), json.loads(str(d["meta"])))
                    )
                print(f"[{cell}] {tag}:"
                      f" wall={passes[-1][1]['wall_seconds']:.1f}s"
                      f" (outer {wall_outer:.1f}s,"
                      f" driver={passes[-1][1]['driver']})", flush=True)
            if not np.array_equal(passes[0][0], passes[1][0]):
                raise AssertionError(
                    f"{cell}: warm re-run is nondeterministic"
                )
            meta_cold, meta_warm = passes[0][1], passes[1][1]

            entry["wall"] = meta_warm["wall_seconds"]
            entry["wall_cold"] = meta_cold["wall_seconds"]
            entry["rate"] = meta_warm["chain_iters_per_sec"]
            entry["driver"] = meta_warm["driver"]
            entry["draws_sha1"] = _draws_sha1(npz_path)
            # draws changed: stale eval results / W checkpoints must not
            # survive a sweep re-run
            for stale in ("rmse_mean", "rmse_std", "w_mean", "w_std",
                          "mmd_mean", "mmd_std", "ess_med", "ess_min",
                          "ess_per_sec", "eval_error", "eval_draws_sha1"):
                entry.pop(stale, None)
            # persist walls NOW: the eval below can run tens of minutes and
            # the queue wraps each cell in `timeout` — a kill there must not
            # lose the timed passes
            state_file.write_text(json.dumps(results))

        # eval skip is ARTIFACT-keyed (mirrors the npz check in have_sweep):
        # requires the per-seed eval CSV on disk AND the row's recorded
        # draws fingerprint to match the npz actually present — a state-file
        # row alone (committed in git) can never silently under-audit a
        # fresh checkout's regenerated draws.
        eval_csv = npz_path.with_name(f"eval_{kernel}.csv")
        have_eval = (
            entry.get("rmse_mean") is not None
            and eval_csv.exists()
            and npz_path.exists()
            and entry.get("eval_draws_sha1") == _draws_sha1(npz_path)
        )
        if have_eval and not args.force_eval:
            print(f"[{cell}] eval artifacts on disk and fingerprint-matched;"
                  " skipping", flush=True)
            continue
        if not args.skip_eval:
            ref = get_reference_draws(
                target, 10_000, n_chains=256, num_warmup=3000, thinning=10,
                cache_dir=f"{args.out_dir}/reference_draws",
            )
            csv = npz_path.with_name(f"eval_{kernel}.csv")
            # kidiq (d=4) cost matrices are tie-dense: single-instance
            # auctions stall in bidding wars, but the batched auction
            # amortizes the war rounds across seeds (VERDICT r2 next #6);
            # 8x (10k x 10k) f32 cost tiles = 3.2 GB HBM.
            # AMT_EVAL_W_BATCH overrides for ALL targets (the batch path
            # also amortizes per-round dispatch for non-degenerate
            # instances — untimed on hardware, hence opt-in).
            import os

            batch = int(os.environ.get(
                "AMT_EVAL_W_BATCH", 8 if target == "kidiq" else 1
            ))
            try:
                df = evaluate_run(
                    npz_path, ref, csv, exact_wasserstein_seeds=100,
                    exact_w_batch=batch, sinkhorn=False, verbose=True,
                    checkpoint=npz_path.with_name(f"wck_{kernel}.json"),
                )
            except Exception as exc:  # draws are saved; eval is retryable
                print(f"[{cell}] EVAL FAILED ({exc}); draws kept, "
                      "continuing with next cell", flush=True)
                entry["eval_error"] = str(exc)
                state_file.write_text(json.dumps(results))
                continue
            entry.pop("eval_error", None)
            entry["eval_draws_sha1"] = (
                entry.get("draws_sha1") or _draws_sha1(npz_path)
            )
            # ESS/sec: median-dim ESS delivered by the whole 100-seed
            # sweep per second of warm sampling wall (VERDICT r3 #4)
            wall = entry.get("wall") or float("nan")
            entry.update(
                rmse_mean=float(df["rmse_means"].mean()),
                rmse_std=float(df["rmse_means"].std()),
                w_mean=float(df["wasserstein"].mean()),
                w_std=float(df["wasserstein"].std()),
                mmd_mean=float(df["mmd"].mean()),
                mmd_std=float(df["mmd"].std()),
                ess_med=float(df["ess_median"].median()),
                ess_min=float(df["ess_min"].min()),
                ess_per_sec=float(df["ess_median"].sum() / wall),
            )
            print(f"[{cell}] rmse={entry['rmse_mean']:.4f}"
                  f"±{entry['rmse_std']:.4f}"
                  f" W={entry['w_mean']:.4f}±{entry['w_std']:.4f}"
                  f" mmd={entry['mmd_mean']:.4f}"
                  f" ess_med={entry['ess_med']:.0f}"
                  f" ess/s={entry['ess_per_sec']:,.0f}", flush=True)
        state_file.write_text(json.dumps(results))
    print("[regen] done")


if __name__ == "__main__":
    main()
