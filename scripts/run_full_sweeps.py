"""Full reproduction of the reference's w_eval experiment matrix on TPU.

For each (target, kernel) in the reference's sweep table
(run_*_wasserstein.py budgets — experiments/configs.W_EVAL_BUDGETS): run
all 100 seeds as ONE chain-batched sharded run, generate gold-standard
draws (PosteriorDB if present, else a long 256-chain NUTS run), evaluate
rmse/wasserstein/mmd per seed, and write:

    mcmc_runs/w_eval/<target>/<kernel>.npz      raw thinned draws
    mcmc_runs/w_eval/<target>/eval_<kernel>.csv per-seed metrics
    RESULTS.md                                   summary table (committed)

Restartable at every stage (sweep manifests + cached reference draws).
Run:  python scripts/run_full_sweeps.py [--targets eight_schools,kidiq]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Persistent compile cache: sweep programs are shape-stable across runs, so
# warm-cache walls reflect the production setting (compiles over the axon
# tunnel otherwise add ~5-20 s per distinct program).
jax.config.update("jax_compilation_cache_dir", "/tmp/amt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from adaptive_mcmc_tpu.experiments.configs import RunConfig, W_EVAL_BUDGETS
from adaptive_mcmc_tpu.experiments.evaluate import (
    evaluate_run,
    get_reference_draws,
)
from adaptive_mcmc_tpu.experiments.runner import run_w_eval

KERNEL_ORDER = ["arwmh", "asss", "nuts"]

# Post-warmup clone fan-out per kernel (parallel.run.fan_state).  NUTS's
# post-warmup kernel is frozen, so fanning is statistically exact.  ASSS
# must NOT fan: the reference resets the adaptation clock at the warmup
# boundary (gamma=1 collapses the scale estimate to rank-1, asss.py:246-255),
# so quality depends on the post-warmup re-adaptation length — measured
# eight-schools rmse degrades 0.063 -> 0.101 with fan 8.  ARWMH is fast
# enough unfanned.
FAN_OUT = {"nuts": 16, "asss": 1, "arwmh": 1}


def _quadrature_parity_row(out_dir: str = "mcmc_runs") -> str:
    """Tabulated non-circular kidiq moments parity (VERDICT r3 #8): pooled
    sample moments of each kidiq cell vs the sampler-independent
    quadrature truth (exact OLS beta + 1-D log-sigma quadrature,
    experiments/quadrature.py).  Returns '' when no kidiq artifacts
    exist yet."""
    import numpy as np

    base = Path(out_dir) / "w_eval" / "kidiq"
    cells = sorted(base.glob("*.npz")) if base.exists() else []
    if not cells:
        return ""
    from adaptive_mcmc_tpu.experiments.quadrature import kidiq_truth

    tr = kidiq_truth()
    t_mean = np.concatenate([tr["mean_beta"], [tr["mean_log_sigma"]]])
    t_sd = np.concatenate([tr["sd_beta"], [tr["sd_log_sigma"]]])
    lines = [
        "Moments parity vs quadrature truth (pooled 100 seeds x 10k "
        "draws; comparison space [beta(3), log_sigma]):",
        "",
        "| kernel | max |mean err| / truth sd | sd ratio range |",
        "|---|---|---|",
    ]
    for npz in cells:
        with np.load(npz, allow_pickle=False) as d:
            s = d["samples"].reshape(-1, d["samples"].shape[-1])
        m = s.mean(axis=0)
        sd = s.std(axis=0)
        zerr = float(np.max(np.abs(m - t_mean) / t_sd))
        ratio = sd / t_sd
        lines.append(
            f"| {npz.stem} | {zerr:.3f} | "
            f"[{ratio.min():.3f}, {ratio.max():.3f}] |"
        )
    return "\n".join(lines)


def summarize(results: dict, out_md: Path):
    lines = [
        "# RESULTS — w_eval reproduction (this framework, one TPU v5e chip)",
        "",
        "Gold standard: the reference repo's checked-in PosteriorDB draws",
        "for diamonds (vendored, models/_gold/), else a long 256-chain NUTS",
        "run of this framework validated against quadrature truths (cached",
        "in `mcmc_runs/reference_draws/`).  Reference (laptop-CPU,",
        "PosteriorDB gold standard) numbers in BASELINE.md for comparison.",
        "",
        "| target | kernel | rmse_means | wasserstein (exact) | mmd "
        "| ESS/10k (med) | ESS/sec | chain-iters/s | wall s (warm) "
        "| wall s (cold) |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    def _pm(r, m, s, fmt="{:.4f}"):
        if r.get(m) is None:
            return "(eval pending)"
        return f"{fmt.format(r[m])} ± {fmt.format(r[s])}"

    for (target, kernel), r in sorted(results.items()):
        cold = f"{r['wall_cold']:.1f}" if r.get("wall_cold") else "—"
        ess = (
            f"{r['ess_med']:,.0f}" if r.get("ess_med") is not None
            else "(pending)"
        )
        ess_s = (
            f"{r['ess_per_sec']:,.0f}" if r.get("ess_per_sec") is not None
            else "—"
        )
        lines.append(
            f"| {target} | {kernel} "
            f"| {_pm(r, 'rmse_mean', 'rmse_std')} "
            f"| {_pm(r, 'w_mean', 'w_std')} "
            f"| {_pm(r, 'mmd_mean', 'mmd_std')} "
            f"| {ess} | {ess_s} "
            f"| {r['rate']:,.0f} | {r['wall']:.1f} | {cold} |"
        )
    lines += [
        "",
        "Notes:",
        "* every row is single-run consistent: scripts/regen_cells.py "
        "generates each cell twice in one process (cold then warm; draws "
        "asserted bitwise identical), records BOTH walls, and computes "
        "the metric rows from exactly those draws.  The cold wall is the "
        "first in-process run: it pays program load over the remote-TPU "
        "tunnel, plus full XLA compiles when the persistent compile "
        "cache (/tmp/amt_jax_cache) is empty — measured 71.6 s for the "
        "eight-schools ARWMH cell cache-cold vs ~5 s cache-warm.  The "
        "warm wall is the steady-state number comparable to the "
        "reference's in-notebook timings (whose CPU-JAX compiles are "
        "negligible).",
        "* exact 1-1 Wasserstein on all 100 seeds: the BATCHED on-device "
        "ε-auction (metrics/assignment.py; 8 seeds per device program "
        "share the war rounds, which amortizes the ~0.8 s/dispatch "
        "tunnel latency and defuses kidiq's tie-dense d=4 instances), "
        "cross-checked per cell against the exact host Hungarian on "
        "seeds 0-1.  MMD/RMSE on all seeds on-device; metric protocol "
        "(rmse/W/mmd) matches the reference eval_*.py.",
        "* reference comparison (BASELINE.md; rmse/W/mmd): eight-schools "
        "ARWMH 0.0745/1.6865/0.0157, ASSS 0.0607/1.7009/0.0148, NUTS "
        "0.0587/1.6992/0.0143; diamonds ARWMH 0.0157/0.1231/0.0331, "
        "ASSS 0.0096/0.1216/0.0140, NUTS 0.0106/0.1218/0.0142 (directly "
        "comparable now that the diamonds posterior is the real one).",
        "* fan-out: NUTS cells sample with post-warmup clone fan-out "
        "(fan_out=16 in the npz config; exact — the post-warmup NUTS "
        "kernel is frozen, so pooling 16 clones of the warmed chain is "
        "a valid draw pool).  ARWMH/ASSS/SA cells run fan_out=1 (their "
        "post-warmup adaptation continues, so the reference's "
        "one-chain-per-seed protocol is kept exactly).",
        "* eight_schools/sa: the reference exposes SA only as a kernel "
        "baseline and never sweeps it (numpyro_kernels.py:16-73); this "
        "row runs it under the ASSS eight-schools budget (our choice) "
        "so the fourth kernel has quality evidence.",
        "* diamonds is the RECONSTRUCTED REAL posterior: the dataset is "
        "synthesized from sufficient statistics recovered from the "
        "reference's checked-in PosteriorDB gold draws, so its posterior "
        "IS the real one (proved analytically: tests/test_models.py::"
        "test_diamonds_reconstruction_matches_gold_analytically); "
        "absolute metric values are comparable to the reference's "
        "diamonds table.  kidiq still uses the documented synthetic "
        "fallback (docs/DATA.md) — cross-kernel patterns comparable, "
        "absolute values not.",
        "* when a sweep is run with --budget-scale, the thinned draw "
        "count stays 10k per seed and the scale shows up in the run npz "
        "meta (wall entries also reveal it).",
        "* ESS: per-seed Geyer initial-monotone ESS on the 10k thinned "
        "draws (infer/diagnostics.py:49; NUTS cells treat the 16 "
        "fan-out clones as chains).  'ESS/10k (med)' is the median "
        "across dims and seeds; 'ESS/sec' is the sweep's total "
        "median-dim ESS (summed over 100 seeds) divided by the warm "
        "sampling wall.  Reference anchors: n_eff 8.3k-10.3k of 10k "
        "draws for all three kernels on eight-schools "
        "(posteriordb_eight-schools.ipynb cells 27-29; BASELINE.md).",
        "",
        "## kidiq comparability (final form)",
        "",
        "kidiq ABSOLUTE metric values are not comparable to the "
        "reference's kidiq table and cannot be made so in this "
        "environment: the real kidiq dataset lives in PosteriorDB "
        "(zero-egress blocked, docs/DATA.md), and — unlike diamonds — "
        "no gold draws are checked into the reference repo to "
        "reconstruct sufficient statistics from (the reference ships "
        "gold draws only for diamonds, "
        "python/mcmc_runs/diamonds-example-references.pkl; its kidiq "
        "eval reads PosteriorDB directly, eval_kidiq_kidscore.py:57-91)."
        "  What IS comparable: (a) CROSS-KERNEL ordering and spreads on "
        "the same synthetic posterior (all kernels graded against one "
        "gold standard), and (b) NON-CIRCULAR absolute truth via "
        "quadrature: the synthetic kidiq posterior's exact moments come "
        "from closed-form OLS beta + 1-D sigma quadrature "
        "(experiments/quadrature.py), independent of any sampler, and "
        "the gold-standard draws are asserted against them "
        "(tests/test_models.py quadrature tests; tabulated "
        "moments-parity row below when artifacts are present).",
    ]
    qrow = _quadrature_parity_row()
    if qrow:
        lines += ["", qrow]
    stale_dia = [
        k for (t, k), r in sorted(results.items())
        if t == "diamonds" and not r.get("wall_cold")
    ]
    if stale_dia:
        lines.append(
            "* TRANSITIONAL: diamonds rows for "
            + "/".join(stale_dia)
            + " still grade the pre-reconstruction synthetic target "
            "(regeneration against the real posterior is queued — "
            "scripts/tpu_queue_r3.sh); rows with a cold-wall entry are "
            "already real-posterior runs."
        )
    asss_std = (results.get(("eight_schools", "asss")) or {}).get("rmse_std")
    spread_now = (
        f"The current regenerated cell's across-seed rmse std is "
        f"{asss_std:.4f}"
        + (
            " — inside the reference's own three-kernel band "
            "(0.0146-0.0177), so the round-3 excess has dissolved with "
            "the pipelined-driver regeneration; the decomposition below "
            "is kept because it explains the mechanism that produced the "
            "earlier ~0.021 spread and still governs the first sampling "
            "quarter."
            if asss_std is not None and asss_std <= 0.0177
            else " vs the reference's 0.0146 (BASELINE.md:26)."
        )
        if asss_std is not None
        else "Across-seed rmse std of the round-3 sweep was ~0.021 vs "
             "the reference's 0.0146 (BASELINE.md:26)."
    )
    lines += [
        "",
        "## The eight-schools ASSS rmse spread vs the reference's",
        "",
        spread_now
        + "  Three-part decomposition of the round-3 spread "
        "(scripts/asss_spread_analysis.py, scripts/_asss_reset_ab.py):",
        "",
        "1. The draws are at reference mixing parity: per-dim Geyer ESS "
        "median ~9.7k/10k (reference reports 9.3k-10.3k), long-lag pooled "
        "ACF ~0 — the excess is not slow mixing.",
        "2. The excess concentrates in the FIRST sampling quarter and is "
        "caused by reference semantics we reproduce deliberately: the "
        "adaptation clock resets at the warmup boundary (reference "
        "asss.py:248), sending gamma back toward 1 so the scale factor "
        "contracts toward single-move outer products before re-converging. "
        "An A/B with the reset removed flattens the per-quarter seed-mean "
        "stds [0.094, 0.069, 0.071, 0.063] -> [0.065, 0.068, 0.065, 0.069] "
        "and moves the spread ~0.023 -> ~0.021.",
        "3. The remainder is sampling noise of the std-over-100-seeds "
        "statistic itself: simulated at the independence floor the spread "
        "ranges [0.013, 0.028] (2.5-97.5%) across gold/seed realizations; "
        "the reference's 0.0146 sits at the low end (P(<=0.0146) = 0.19), "
        "and our ARWMH (0.0150) and NUTS (0.0154) cells land in the same "
        "band as the reference's own three kernels (0.0146-0.0177).",
    ]
    out_md.write_text("\n".join(lines) + "\n")
    print(f"[results] {out_md}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", default="eight_schools,kidiq,diamonds")
    ap.add_argument("--kernels", default=",".join(KERNEL_ORDER))
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--out-dir", default="mcmc_runs")
    ap.add_argument("--results", default="RESULTS.md")
    ap.add_argument("--exact-w-seeds", type=int, default=100,
                    help="seeds receiving the exact O(n^3) Hungarian W "
                         "(host process pool); Sinkhorn covers all seeds")
    ap.add_argument("--host-eval-targets", default="kidiq",
                    help="targets whose exact-W eval runs in the separate "
                         "host-Hungarian worker (scripts/eval_host.py): "
                         "tie-dense low-dim targets degenerate the "
                         "on-device auction")
    ap.add_argument("--budget-scale", type=float, default=1.0,
                    help="scale warmup/samples proportionally (keeps the "
                         "thinned draw count in proportion); use for "
                         "targets whose reference budgets are sequential-"
                         "step-bound (diamonds RWM/SSS: 11M serial steps)")
    args = ap.parse_args()

    results_path = Path(args.results)
    results: dict = {}
    # reload previous results if present (restartability across stages)
    state_file = Path(args.out_dir) / "results_state.json"
    if state_file.exists():
        results = {
            tuple(k.split("|")): v
            for k, v in json.loads(state_file.read_text()).items()
        }

    host_eval = set(filter(None, args.host_eval_targets.split(",")))
    for target in args.targets.split(","):
        ref = get_reference_draws(
            target, 10_000, n_chains=256, num_warmup=3000, thinning=10,
            cache_dir=f"{args.out_dir}/reference_draws",
        )
        print(f"[ref] {target}: {ref.shape} gold-standard draws")
        for kernel in args.kernels.split(","):
            if (target, kernel) in results:
                print(f"[skip] {target}/{kernel} already evaluated")
                continue
            budget = dict(W_EVAL_BUDGETS[(target, kernel)])
            if args.budget_scale != 1.0:
                # scale total iterations but keep the thinned draw count
                # (10k draws per seed) so the evaluation stays comparable —
                # draws just come from a shorter, more correlated run
                s = args.budget_scale
                n_draws = budget["num_samples"] // budget["thinning"]
                budget["num_warmup"] = max(1, int(budget["num_warmup"] * s))
                budget["thinning"] = max(1, int(budget["thinning"] * s))
                budget["num_samples"] = n_draws * budget["thinning"]
            fan = FAN_OUT.get(kernel, 1)
            n_draws = budget["num_samples"] // budget["thinning"]
            if n_draws % fan:
                fan = 1
            cfg = RunConfig(
                target=target, kernel=kernel, n_seeds=args.seeds,
                out_dir=args.out_dir, fan_out=fan, **budget,
            )
            t0 = time.time()
            npz = run_w_eval(cfg)
            wall = time.time() - t0
            if target in host_eval:
                # runs only; scripts/eval_host.py owns the eval and
                # scripts/merge_results.py folds it into RESULTS.md
                continue
            with np.load(npz, allow_pickle=False) as data:
                meta = json.loads(str(data["meta"]))
            csv = npz.with_name(f"eval_{kernel}.csv")
            df = evaluate_run(
                npz, ref, csv,
                exact_wasserstein_seeds=args.exact_w_seeds,
                sinkhorn=False,
                verbose=True,
            )
            results[(target, kernel)] = {
                "rmse_mean": float(df["rmse_means"].mean()),
                "rmse_std": float(df["rmse_means"].std()),
                "w_mean": float(df["wasserstein"].mean()),
                "w_std": float(df["wasserstein"].std()),
                "mmd_mean": float(df["mmd"].mean()),
                "mmd_std": float(df["mmd"].std()),
                "rate": meta["chain_iters_per_sec"],
                "wall": meta["wall_seconds"],
            }
            state_file.write_text(
                json.dumps({f"{k[0]}|{k[1]}": v for k, v in results.items()})
            )
            summarize(results, results_path)
            print(
                f"[eval] {target}/{kernel}: W="
                f"{results[(target, kernel)]['w_mean']:.4f} "
                f"(total {wall:.1f}s)"
            )


if __name__ == "__main__":
    main()
