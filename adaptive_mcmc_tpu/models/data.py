"""Datasets for the PosteriorDB targets.

The reference pulls data from a locally cloned PosteriorDB
(/root/reference/python/scripts/run_eight_schools_wasserstein.py:16-22).
This module loads from PosteriorDB when ``$MCMC_WORKDIR/posteriordb`` exists
and otherwise falls back to vendored/synthetic data:

* ``eight_schools``: the canonical Rubin (1981) dataset, vendored verbatim
  (it is 16 numbers and fully public).
* ``kidiq`` / ``diamonds``: deterministic synthetic datasets with the same
  shapes, predictor structure, and fitted-coefficient scales as the real ones
  (documented below), so throughput benchmarks and adaptation dynamics are
  representative even without network access. When PosteriorDB is present the
  real data is used instead.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from pathlib import Path

import numpy as np


def _pdb_root() -> Path | None:
    wd = os.environ.get("MCMC_WORKDIR")
    if not wd:
        return None
    p = Path(wd) / "posteriordb" / "posterior_database"
    return p if p.exists() else None


def _pdb_data(dataset_name: str) -> dict | None:
    """Read a PosteriorDB data JSON (possibly zipped) without the posteriordb
    package."""
    root = _pdb_root()
    if root is None:
        return None
    base = root / "data" / "data"
    for cand in (base / f"{dataset_name}.json", base / f"{dataset_name}.json.zip"):
        if cand.exists():
            if cand.suffix == ".zip":
                import zipfile

                with zipfile.ZipFile(cand) as zf:
                    with zf.open(zf.namelist()[0]) as f:
                        return json.load(f)
            return json.loads(cand.read_text())
    return None


@lru_cache(maxsize=None)
def eight_schools() -> dict:
    """Rubin (1981) eight-schools data (y: treatment effects, sigma: SEs)."""
    d = _pdb_data("eight_schools")
    if d is not None:
        return {"y": np.asarray(d["y"], np.float32),
                "sigma": np.asarray(d["sigma"], np.float32)}
    return {
        "y": np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0], np.float32),
        "sigma": np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0], np.float32),
    }


@lru_cache(maxsize=None)
def kidiq() -> dict:
    """kidiq (Gelman & Hill 2007): kid_score ~ mom_hs + mom_iq, N=434.

    Synthetic fallback matches the published fit kid_score ≈ 26 + 6*mom_hs +
    0.6*mom_iq + N(0, 18), mom_hs ~ Bernoulli(0.785), mom_iq ~ N(100, 15).
    """
    d = _pdb_data("kidiq")
    if d is not None:
        return {k: np.asarray(d[k], np.float32)
                for k in ("kid_score", "mom_hs", "mom_iq")}
    rng = np.random.default_rng(20260816)
    n = 434
    mom_hs = (rng.random(n) < 0.785).astype(np.float32)
    mom_iq = (100.0 + 15.0 * rng.standard_normal(n)).astype(np.float32)
    kid_score = (26.0 + 6.0 * mom_hs + 0.6 * mom_iq
                 + 18.0 * rng.standard_normal(n)).astype(np.float32)
    return {"kid_score": kid_score, "mom_hs": mom_hs, "mom_iq": mom_iq}


@lru_cache(maxsize=None)
def diamonds() -> dict:
    """diamonds GLM (brms formulation): log(price) on 24 predictors, N=5000.

    Fallback: a dataset RECONSTRUCTED to have the real posterior.  The
    diamonds model is a Gaussian linear regression (b ~ N(0,1)^24,
    Y ~ N(Intercept + Xc b, sigma) — run_diamonds_wasserstein.py:23-39),
    so its posterior depends on the data only through the sufficient
    statistics (n, Xc'Xc, Xc'Yc, Yc'Yc, Ybar).  Those were recovered from
    the reference's checked-in real-diamonds gold-standard draws
    (python/mcmc_runs/diamonds-example-references.pkl; see
    scripts/make_diamonds_real.py) and vendored in _diamonds_stats.npz;
    this generator synthesizes a deterministic (X, Y) matching them
    EXACTLY, so the resulting posterior equals the real one up to the
    ~1.4%-relative sampling noise of a 10k-draw covariance estimate —
    including its defining difficulty: posterior b-stds spanning
    0.001..0.57 (prior-dominated near-collinear directions) with
    cond(cov) = 3.4e5.
    """
    d = _pdb_data("diamonds")
    if d is not None:
        return {"Y": np.asarray(d["Y"], np.float32),
                "X": np.asarray(d["X"], np.float32)}
    s = np.load(Path(__file__).parent / "_diamonds_stats.npz")
    A, c, yty, ybar, n = (
        s["A"], s["c"], float(s["yty"]), float(s["ybar"]), int(s["n"])
    )
    k = A.shape[0]
    rng = np.random.default_rng(20260817)
    # orthonormal frame U (n, k+1), all columns orthogonal to the ones
    # vector (QR of column-centered gaussians stays in the centered span)
    G = rng.standard_normal((n, k + 1))
    G -= G.mean(axis=0, keepdims=True)
    Q, _ = np.linalg.qr(G)
    U, u_res = Q[:, :k], Q[:, k]
    L = np.linalg.cholesky(A)
    Xc = U @ L.T                       # Xc'Xc = A exactly, column means 0
    beta_star = np.linalg.solve(A, c)
    r2 = yty - float(c @ beta_star)    # residual sum of squares
    assert r2 > 0, r2
    Yc = Xc @ beta_star + np.sqrt(r2) * u_res
    X = np.concatenate([np.ones((n, 1)), Xc], axis=1)
    return {"Y": (ybar + Yc).astype(np.float32), "X": X.astype(np.float32)}
