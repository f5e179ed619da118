"""Reconstruct the REAL diamonds posterior from the reference's checked-in
gold draws, and vendor (a) the sufficient statistics of a dataset whose
posterior equals it, (b) the gold draws themselves as the eval reference.

The reference repo ships two pickles of real-diamonds posterior draws
(python/mcmc_runs/diamonds-example-{references,samples}.pkl — the
PosteriorDB gold standard and one of its own MCMC runs, used by
compare_wasserstein.py:36-39).  The diamonds model is a Gaussian linear
regression (b ~ N(0,1), Y ~ N(Intercept + Xc b, sigma)), so its posterior
depends on the data ONLY through the sufficient statistics
(n, Xc'Xc, Xc'Yc, Yc'Yc, Ybar).  Those are recoverable from the gold
draws:

    Xc'Xc = sigma^2 (Cov[b|Y]^-1 - I)        (ridge-posterior precision)
    Xc'Yc = (Xc'Xc + sigma^2 I) E[b|Y]
    Ybar  = E[Intercept|Y]                   (centered design)
    Yc'Yc : calibrated so the model's exact 1-D sigma marginal
            (computable in closed form from the stats) reproduces
            E[log sigma] of the gold draws
    n = 5000 (PosteriorDB diamonds; also implied by Var[log sigma] ~ 1/2n)

Any dataset with these statistics yields the REAL posterior (up to the
~1.4% sampling noise of a 10k-draw covariance estimate).  models/data.py
synthesizes one deterministically from the vendored stats — replacing the
round-2 ad-hoc synthetic whose posterior was ~100x easier than the real
one (VERDICT r2 weak #4: cond 2e2 vs the real 3.4e5, W floor 0.01 vs
0.12).

Writes:  adaptive_mcmc_tpu/models/_diamonds_stats.npz   (~8 KB)
         adaptive_mcmc_tpu/models/_gold/diamonds.npy    (10k x 26 f32)

Run once:  python scripts/make_diamonds_real.py
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np
from scipy.special import digamma

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/python/mcmc_runs")


def load_comparison(name: str) -> np.ndarray:
    with open(REF / f"diamonds-example-{name}.pkl", "rb") as f:
        d = pickle.load(f)
    return np.concatenate(
        [np.asarray(d["Intercept"])[:, None],
         np.asarray(d["b"]),
         np.log(np.asarray(d["sigma"]))[:, None]], axis=1,
    ).astype(np.float64)


def expected_log_sigma(yty: float, A_eigs: np.ndarray, cTV2: np.ndarray,
                       n: int) -> float:
    """E[log sigma | Y] under the model, by quadrature over the exact 1-D
    marginal.  With b ~ N(0, I):  Yc | sigma ~ N(0, sigma^2 I + Xc Xc'),
    so up to constants

      log p(sigma|Y) = log p(sigma) - 1/2 [ (n-k) log s2
          + sum_j log(s2 + l_j) + yty/s2
          - sum_j (c'v_j)^2 / (l_j (s2 + l_j)) * (l_j/s2) ... ]

    where l_j = eigs of Xc'Xc and c = Xc'Yc.  Using
    (sigma^2 I + Xc Xc')^{-1} applied through the SVD:
      quad = yty/s2 - sum_j (c'v_j)^2 / (s2 (s2 + l_j)).
    """
    ls = np.linspace(-2.2, -2.0, 4001)  # log sigma grid around the truth
    s2 = np.exp(2 * ls)[:, None]
    l = A_eigs[None, :]
    quad = yty / s2[:, 0] - np.sum(cTV2[None, :] / (s2 * (s2 + l)), axis=1)
    logdet = (n - len(A_eigs)) * np.log(s2[:, 0]) + np.sum(
        np.log(s2 + l), axis=1
    )
    # prior: sigma ~ Folded-StudentT(3, 0, 10) on sigma, + log-Jacobian;
    # locally flat at sigma ~ 0.12 — constant over the grid, drop it
    logp = -0.5 * (quad + logdet) + ls  # + ls: d sigma / d log sigma
    logp -= logp.max()
    w = np.exp(logp)
    return float(np.sum(ls * w) / np.sum(w))


def main():
    ref = load_comparison("references")
    n = 5000
    k = 24
    B = ref[:, 1:25]
    ls_mean = float(ref[:, -1].mean())
    sig2 = float(np.exp(2 * ls_mean))
    ybar = float(ref[:, 0].mean())

    S = np.cov(B.T)
    S = (S + S.T) / 2
    # cap posterior variances at the prior's (eigs of S must be < 1 for a
    # PD Xc'Xc; sampling noise could push a prior-dominated one over)
    ev, U = np.linalg.eigh(S)
    ev = np.clip(ev, 1e-8, 0.999)
    Sinv = (U / ev) @ U.T
    A = sig2 * (Sinv - np.eye(k))
    A = (A + A.T) / 2
    evA, V = np.linalg.eigh(A)
    assert evA.min() > 0, evA.min()
    m = B.mean(0)
    c = (A + sig2 * np.eye(k)) @ m

    # calibrate Yc'Yc so the exact sigma marginal matches the gold draws
    cTV2 = (c @ V) ** 2
    beta_star = V @ ((V.T @ c) / evA)
    yty_lo = float(beta_star @ A @ beta_star) * (1 + 1e-9)
    lo, hi = yty_lo + 0.5 * sig2 * n, yty_lo + 1.5 * sig2 * n
    for _ in range(60):  # bisection on monotone E[log sigma](yty)
        mid = 0.5 * (lo + hi)
        if expected_log_sigma(mid, evA, cTV2, n) < ls_mean:
            lo = mid
        else:
            hi = mid
    yty = 0.5 * (lo + hi)
    got = expected_log_sigma(yty, evA, cTV2, n)
    print(f"calibrated Yc'Yc = {yty:.4f}  E[log sigma] = {got:.5f} "
          f"(target {ls_mean:.5f})")

    out = REPO / "adaptive_mcmc_tpu" / "models" / "_diamonds_stats.npz"
    np.savez_compressed(out, A=A, c=c, yty=yty, ybar=ybar, n=n)
    print(f"wrote {out} ({out.stat().st_size} B)")

    gold_dir = REPO / "adaptive_mcmc_tpu" / "models" / "_gold"
    gold_dir.mkdir(exist_ok=True)
    np.save(gold_dir / "diamonds.npy", ref.astype(np.float32))
    print(f"wrote {gold_dir / 'diamonds.npy'}")

    # report: posterior geometry
    print("posterior b-std range %.4f..%.4f cond %.2e"
          % (np.sqrt(ev.min()), np.sqrt(ev.max()),
             ev.max() / ev.min()))


if __name__ == "__main__":
    main()
