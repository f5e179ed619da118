"""Why is the eight-schools ASSS across-seed rmse spread larger than the
reference's published 0.0607 +- 0.0146 (BASELINE.md:26)?

Decomposition (run on the w_eval npz + an A/B counterfactual):

1.  Our thinned draws are at reference mixing parity: per-dim Geyer ESS
    median ~9.7k/10k (reference reports 9.3k-10.3k), long-lag pooled ACF
    ~= 0.  The spread excess is NOT slow mixing of the draws overall.

2.  The excess concentrates in the FIRST QUARTER of the sampling phase:
    per-quarter seed-mean stds of mu are ~[0.094, 0.069, 0.071, 0.063]
    against an independent-draw floor of 0.066.  Mechanism: the reference
    resets the adaptation clock at the warmup boundary
    (reference asss.py:248: ``n = where(i < warmup, itr, itr - warmup)``),
    so gamma jumps back to ~1 and the scale matrix is pulled toward the
    covariance of the first few post-boundary moves (the gamma=1 step
    itself NaN-guards into keeping the old factor, but gamma=0.63, 0.48...
    contract it toward single-move outer products) before re-converging at
    n^-2/3.  We reproduce this semantics faithfully (kernels/base.py
    adaptation_lr); an A/B with the reset removed (variant B below)
    eliminates the first-quarter elevation and moves the spread from
    ~0.023 to ~0.021 under the same gold standard.

3.  The remaining gap to 0.0146 is within the sampling distribution of
    the std-across-100-seeds statistic itself: simulate per-seed rmse =
    ||err||_2 with err_j ~ N(offset_j, sigma_j^2), sigma_mu at the
    independent floor 0.0332 and the gold standard's own 10k-draw noise as
    the offset; the simulated std ranges ~[0.013, 0.028] (2.5-97.5%)
    across gold/seed realizations.  The reference's 0.0146 sits at the low
    end; our NUTS cell (0.0154) and ARWMH cell (0.0150) land in the same
    band, and the reference's own three kernels cluster at 0.0146-0.0177.

Run:  python scripts/asss_spread_analysis.py [--ab]   (--ab re-runs the
CPU counterfactual, ~8 min; default just re-derives 1 and 3 from the
checked-in npz.)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def geyer_ess(x: np.ndarray) -> float:
    n = len(x)
    x = x - x.mean()
    f = np.fft.rfft(x, 2 * n)
    acf = np.fft.irfft(f * np.conj(f))[:n].real
    acf /= acf[0]
    s = 0.0
    for t in range(1, n - 1, 2):
        pair = acf[t] + acf[t + 1]
        if pair < 0:
            break
        s += pair
    return n / (1 + 2 * s)


def quarters(x: np.ndarray):
    """Per-quarter std of seed means; x is (seeds, draws)."""
    q = x.shape[1] // 4
    return [x[:, i * q:(i + 1) * q].mean(1).std() for i in range(4)]


def spread_simulation(sig_mu: float, n_rep: int = 2000, seed: int = 0):
    """Sampling distribution of mean/std of per-seed rmse over gold-noise
    and seed realizations (eight-schools comparison space, 10 dims)."""
    rng = np.random.default_rng(seed)
    gold_std = np.array(
        [3.318, 1.163, 0.985, 0.944, 0.974, 0.939, 0.926, 0.948, 0.967,
         0.978]
    )
    sig = np.concatenate([[sig_mu], gold_std[1:] / np.sqrt(10_000)])
    gse = gold_std / np.sqrt(10_000)  # gold standard's own mean error
    means, stds = [], []
    for _ in range(n_rep):
        off = rng.standard_normal(10) * gse
        e = rng.standard_normal((100, 10)) * sig + off
        r = np.linalg.norm(e, axis=1)
        means.append(r.mean())
        stds.append(r.std())
    return np.asarray(means), np.asarray(stds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ab", action="store_true")
    ap.add_argument("--npz",
                    default="mcmc_runs/w_eval/eight_schools/asss.npz")
    args = ap.parse_args()

    d = np.load(args.npz, allow_pickle=False)
    s = d["samples"]
    mu = s[:, :, 0]
    ess = [geyer_ess(mu[i]) for i in range(s.shape[0])]
    print(f"Geyer ESS of mu: median {np.median(ess):.0f} / {s.shape[1]}"
          " (reference n_eff: 9.3k-10.3k)")
    qs = quarters(mu)
    floor = 3.318 / np.sqrt(s.shape[1] // 4)
    print("per-quarter seed-mean std of mu:",
          [f"{v:.4f}" for v in qs], f"(independent floor {floor:.4f})")
    print(f"full-run seed-mean std of mu: {mu.mean(1).std():.4f} "
          f"(floor {3.318 / np.sqrt(s.shape[1]):.4f})")

    m, st = spread_simulation(sig_mu=0.0332)
    print("simulated rmse std at independence-floor mixing: "
          f"{st.mean():.4f} [{np.percentile(st, 2.5):.4f}, "
          f"{np.percentile(st, 97.5):.4f}] across realizations")
    print(f"  P(std <= 0.0146 reference value) = {(st <= 0.0146).mean():.2f}")

    if args.ab:
        import subprocess
        print("\n[A/B] rerunning reset counterfactual on CPU (~8 min)...")
        subprocess.run(
            [sys.executable, __file__.replace(
                "asss_spread_analysis", "_asss_reset_ab")],
            check=False,
        )


if __name__ == "__main__":
    main()
