"""Regenerate the self-consistent gold-standard draws and validate them
against the analytic/quadrature truths (experiments/quadrature.py).

Run on the TPU:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/make_gold.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adaptive_mcmc_tpu.experiments.evaluate import make_reference_draws
from adaptive_mcmc_tpu.experiments.quadrature import (
    eight_schools_truth,
    kidiq_truth,
)

CACHE = Path("mcmc_runs/reference_draws")
GOLD_KW = dict(n_chains=256, num_warmup=3000, thinning=10)


def main():
    for target in ("eight_schools", "kidiq", "diamonds"):
        f = CACHE / f"{target}_nuts.npy"
        if f.exists():
            f.unlink()
        draws = make_reference_draws(target, 10_000, **GOLD_KW)
        print(f"{target}: {draws.shape} regenerated")

    es = np.load(CACHE / "eight_schools_nuts.npy")
    t = eight_schools_truth()
    print(
        f"eight_schools gold:  mean(log_tau) {es[:,1].mean():+.4f} "
        f"(truth {t['mean_log_tau']:+.4f})  sd {es[:,1].std():.4f} "
        f"(truth {t['sd_log_tau']:.4f})  mean(mu) {es[:,0].mean():+.4f} "
        f"(truth {t['mean_mu']:+.4f})"
    )
    assert abs(es[:, 1].mean() - t["mean_log_tau"]) < 0.04
    assert abs(es[:, 1].std() - t["sd_log_tau"]) < 0.05

    kq = np.load(CACHE / "kidiq_nuts.npy")
    t = kidiq_truth()
    print(
        f"kidiq gold:          mean(beta) {kq[:, :3].mean(0)} "
        f"(truth {t['mean_beta']})  mean(log_sigma) {kq[:,3].mean():+.4f} "
        f"(truth {t['mean_log_sigma']:+.4f})"
    )
    assert np.all(np.abs(kq[:, :3].mean(0) - t["mean_beta"])
                  < 4 * t["sd_beta"] / 8 + 0.05)
    assert abs(kq[:, 3].mean() - t["mean_log_sigma"]) < 0.02

    dm = np.load(CACHE / "diamonds_nuts.npy")
    print(f"diamonds gold:       mean(Intercept) {dm[:,0].mean():+.4f}  "
          f"mean(log_sigma) {dm[:,-1].mean():+.4f}")
    print("gold standards regenerated + validated")


if __name__ == "__main__":
    main()
