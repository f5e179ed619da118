"""Full reproduction of the reference's lr_decay experiment family.

For each target in {eight_schools (centered), diamonds, kidiq} x kernel in
{arwmh, asss} x lr_decay in {1, 2/3, 1/2}: run 100 seeds as one batched
chain axis for 10^6 iterations, collecting full states on the log grid
(infer.collect.collect_states_logscale), then produce the PE and
adaptation-drift figure families (analysis.artifact_figures).

Reference: run_{eight_schools,diamonds,kidiq_kidscore}_lr_decay.py —
3 decays x 100 seeds x 2 kernels x 10^6 iterations each, as sequential
CPU loops (days of laptop time); here each (kernel, decay) cell is one
batched TPU program.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_lr_decay_sweeps.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/amt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adaptive_mcmc_tpu.experiments.runner import run_lr_decay  # noqa: E402

# diamonds first: its pre-reset artifacts/figures described the obsolete
# synthetic posterior, so if the round ends mid-family the most valuable
# regeneration has already happened (the queue runs cells in this order)
LR_TARGETS = ["diamonds", "eight_schools_centered", "kidiq"]
# artifact paths keep the eval-target name so the figure layer can pair
# them with w_eval/gold artifacts
PATH_NAME = {
    "eight_schools_centered": "eight_schools_centered",
    "diamonds": "diamonds",
    "kidiq": "kidiq",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", default=",".join(LR_TARGETS))
    ap.add_argument("--kernels", default="arwmh,asss")
    ap.add_argument("--n-pow", type=int, default=6)
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--figures", action="store_true", default=True)
    args = ap.parse_args()

    for target in args.targets.split(","):
        for kernel in args.kernels.split(","):
            t0 = time.time()
            paths = run_lr_decay(
                target, kernel, n_pow=args.n_pow, n_seeds=args.seeds
            )
            print(
                f"[lr_decay] {target}/{kernel}: {len(paths)} decays "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )

    if args.figures:
        from adaptive_mcmc_tpu.analysis.artifact_figures import main as figs

        figs("img")


if __name__ == "__main__":
    main()
