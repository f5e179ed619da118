"""Command-line entry points for the experiment harness.

    python -m adaptive_mcmc_tpu.experiments.cli w_eval \
        --target eight_schools --kernel arwmh [--seeds 100] [--scale 0.1]
    python -m adaptive_mcmc_tpu.experiments.cli lr_decay \
        --target eight_schools_centered --kernel arwmh [--n-pow 6]
    python -m adaptive_mcmc_tpu.experiments.cli evaluate \
        --target eight_schools --kernel arwmh
    python -m adaptive_mcmc_tpu.experiments.cli summary \
        --target eight_schools --kernel nuts

Replaces the reference's per-target run/eval scripts
(run_*_wasserstein.py, run_*_lr_decay.py, eval_*.py) with one config-driven
CLI; ``--scale`` shrinks the reference iteration budgets proportionally for
smoke runs.
"""

from __future__ import annotations

import argparse
import sys


def _scaled_budget(target: str, kernel: str, scale: float):
    from adaptive_mcmc_tpu.experiments.configs import W_EVAL_BUDGETS

    b = dict(W_EVAL_BUDGETS[(target, kernel if kernel != "rwm" else "arwmh")])
    if scale != 1.0:
        b["num_warmup"] = max(1, int(b["num_warmup"] * scale))
        n_thin = max(1, int(b["num_samples"] * scale / b["thinning"]))
        b["num_samples"] = n_thin * b["thinning"]
    return b


def main(argv=None):
    p = argparse.ArgumentParser(prog="adaptive_mcmc_tpu.experiments")
    p.add_argument("command",
                   choices=["w_eval", "lr_decay", "evaluate", "summary"])
    p.add_argument("--target", required=True)
    p.add_argument("--kernel", required=True)
    p.add_argument("--seeds", type=int, default=100)
    p.add_argument("--scale", type=float, default=1.0,
                   help="shrink reference iteration budgets by this factor")
    p.add_argument("--n-pow", type=int, default=6)
    p.add_argument("--lr-decay", type=float, default=2.0 / 3.0)
    p.add_argument("--out-dir", default="mcmc_runs")
    p.add_argument("--mesh-devices", type=int, default=None)
    p.add_argument("--ref-kernel", default="nuts",
                   help="kernel used to generate gold-standard draws when "
                        "PosteriorDB is unavailable (evaluate command)")
    p.add_argument("--ref-draws", type=int, default=10_000)
    args = p.parse_args(argv)

    if args.command == "w_eval":
        from adaptive_mcmc_tpu.experiments.configs import RunConfig
        from adaptive_mcmc_tpu.experiments.runner import run_w_eval

        budget = _scaled_budget(args.target, args.kernel, args.scale)
        cfg = RunConfig(
            target=args.target, kernel=args.kernel, n_seeds=args.seeds,
            lr_decay=args.lr_decay, out_dir=args.out_dir,
            mesh_devices=args.mesh_devices, **budget,
        )
        run_w_eval(cfg)
    elif args.command == "lr_decay":
        from adaptive_mcmc_tpu.experiments.runner import run_lr_decay

        run_lr_decay(
            args.target, args.kernel, n_pow=args.n_pow,
            n_seeds=args.seeds, out_dir=args.out_dir,
        )
    elif args.command == "evaluate":
        from pathlib import Path

        from adaptive_mcmc_tpu.experiments.evaluate import (
            evaluate_run,
            get_reference_draws,
        )

        run_npz = Path(args.out_dir) / "w_eval" / args.target / (
            f"{args.kernel}.npz"
        )
        if not run_npz.exists():
            sys.exit(f"no run found at {run_npz}; run w_eval first")
        ref = get_reference_draws(
            args.target, args.ref_draws, kernel_name=args.ref_kernel,
            cache_dir=str(Path(args.out_dir) / "reference_draws"),
        )
        out_csv = run_npz.with_name(f"eval_{args.kernel}.csv")
        df = evaluate_run(run_npz, ref, out_csv)
        print(df.describe().loc[["mean", "std"]])
        print(f"written {out_csv}")
    elif args.command == "summary":
        import jax

        from adaptive_mcmc_tpu.experiments.runner import (
            TARGETS,
            build_kernel,
        )
        from adaptive_mcmc_tpu.infer.mcmc import MCMC

        target = TARGETS[args.target]()
        kernel = build_kernel(
            args.kernel, target, lr_decay=args.lr_decay, num_warmup=1000
        )
        mcmc = MCMC(kernel, num_warmup=1000,
                    num_samples=max(1000, int(10000 * args.scale)),
                    thinning=1, n_chains=8)
        mcmc.run(jax.random.PRNGKey(0))
        print(mcmc.diagnostics_str())
        mcmc.print_summary()


if __name__ == "__main__":
    main()
