"""Sample-quality evaluation against gold-standard reference draws.

Rebuild of the reference's eval scripts (eval_eight_schools.py:54-89 etc.):
per seed, compare 10k thinned draws to PosteriorDB reference draws in the
standard *comparison space* — scale parameters log-transformed,
non-centered theta recovered from constrained reference draws — with
moment-RMSE (p=1), exact 1-1 Wasserstein, and median-heuristic MMD, and
write a CSV.

Comparison spaces (must match eval_*.py exactly):
  * eight_schools:  [mu, log(tau), theta_base(8)]  (eval_eight_schools.py:39-51)
  * diamonds:       [Intercept, b(24), log(sigma)] (eval_diamonds.py)
  * kidiq:          [beta(3), log(sigma)]          (eval_kidiq_kidscore.py)
These are exactly this framework's unconstrained flat layouts, so 'the
comparison space' is simply the unconstrained samples — no per-site
surgery needed.

Gold-standard draws come from PosteriorDB when present; otherwise
:func:`make_reference_draws` generates a self-consistent gold standard
with a long, heavily-thinned NUTS (or ASSS) run.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu.experiments.runner import TARGETS, build_kernel
from adaptive_mcmc_tpu.metrics import (
    pth_moment_rmse,
    wasserstein_sinkhorn,
)


def make_reference_draws(
    target_name: str,
    n_draws: int = 10_000,
    *,
    kernel_name: str = "nuts",
    rng_seed: int = 999,
    cache_dir: str = "mcmc_runs/reference_draws",
    n_chains: int = 50,
    num_warmup: int = 2000,
    thinning: int = 20,
) -> np.ndarray:
    """Self-consistent gold standard: many parallel chains, long warmup,
    heavy thinning.  Cached to disk."""
    cache = Path(cache_dir) / f"{target_name}_{kernel_name}.npy"
    if cache.exists():
        return np.load(cache)
    from adaptive_mcmc_tpu.infer.mcmc import run_mcmc

    target = TARGETS[target_name]()
    per_chain = max(1, -(-n_draws // n_chains))  # ceil: never under-deliver
    kernel = build_kernel(
        kernel_name, target, lr_decay=2.0 / 3.0, num_warmup=num_warmup
    )
    samples, _, _ = run_mcmc(
        kernel,
        jax.random.PRNGKey(rng_seed),
        num_warmup=num_warmup,
        num_samples=per_chain * thinning,
        thinning=thinning,
        n_chains=n_chains,
    )
    out = np.asarray(samples).reshape(-1, target.dim)[:n_draws]
    cache.parent.mkdir(parents=True, exist_ok=True)
    np.save(cache, out)
    return out


def posteriordb_reference_draws(target_name: str) -> Optional[np.ndarray]:
    """Load PosteriorDB gold-standard draws mapped into the comparison
    space, if a local PosteriorDB clone is available."""
    import os

    wd = os.environ.get("MCMC_WORKDIR")
    if not wd:
        return None
    # PosteriorDB layout: reference_posteriors/draws/draws/<name>.json(.zip)
    name_map = {
        "eight_schools": "eight_schools-eight_schools_noncentered",
        "diamonds": "diamonds-diamonds",
        "kidiq": "kidiq-kidscore_momhsiq",
    }
    root = (
        Path(wd) / "posteriordb" / "posterior_database"
        / "reference_posteriors" / "draws" / "draws"
    )
    pname = name_map.get(target_name)
    if pname is None:
        return None
    blob = None
    for cand in (root / f"{pname}.json", root / f"{pname}.json.zip"):
        if cand.exists():
            if cand.suffix == ".zip":
                import zipfile

                with zipfile.ZipFile(cand) as zf:
                    with zf.open(zf.namelist()[0]) as f:
                        blob = json.load(f)
            else:
                blob = json.loads(cand.read_text())
            break
    if blob is None:
        return None
    # blob: list of chains, each {param_name: [draws]}
    chains = blob
    cols: dict[str, np.ndarray] = {}
    for c in chains:
        for k, v in c.items():
            cols.setdefault(k, []).append(np.asarray(v, np.float64))
    cols = {k: np.concatenate(v) for k, v in cols.items()}

    if target_name == "eight_schools":
        mu = cols["mu"]
        tau = cols["tau"]
        thetas = np.stack(
            [cols[f"theta[{i+1}]"] for i in range(8)], axis=1
        )
        theta_base = (thetas - mu[:, None]) / tau[:, None]
        return np.concatenate(
            [mu[:, None], np.log(tau)[:, None], theta_base], axis=1
        ).astype(np.float32)
    if target_name == "diamonds":
        b = np.stack([cols[f"b[{i+1}]"] for i in range(24)], axis=1)
        return np.concatenate(
            [
                cols["Intercept"][:, None],
                b,
                np.log(cols["sigma"])[:, None],
            ],
            axis=1,
        ).astype(np.float32)
    if target_name == "kidiq":
        beta = np.stack([cols[f"beta[{i+1}]"] for i in range(3)], axis=1)
        return np.concatenate(
            [beta, np.log(cols["sigma"])[:, None]], axis=1
        ).astype(np.float32)
    return None


def vendored_gold_draws(target_name: str) -> Optional[np.ndarray]:
    """Vendored real gold-standard draws in comparison space.

    diamonds: the PosteriorDB gold standard, extracted from the
    reference's checked-in pickle (scripts/make_diamonds_real.py) —
    10k x 26 float32 in [Intercept, b(24), log(sigma)] layout."""
    from adaptive_mcmc_tpu import models as _models

    p = (
        Path(_models.__file__).parent / "_gold" / f"{target_name}.npy"
    )
    return np.load(p) if p.exists() else None


def get_reference_draws(
    target_name: str, n_draws: int = 10_000, **kw
) -> np.ndarray:
    ref = posteriordb_reference_draws(target_name)
    if ref is not None:
        return ref
    ref = vendored_gold_draws(target_name)
    if ref is not None:
        return ref
    return make_reference_draws(target_name, n_draws, **kw)


def ess_columns(samples: np.ndarray, fan_out: int = 1) -> np.ndarray:
    """Per-seed Geyer ESS across dims: (seeds, draws, dim) -> (seeds, dim).

    ``fan_out`` > 1 means each seed's draw axis interleaves F post-warmup
    clone chains frame-major (runner._per_seed), so the draws reshape to
    (frames, F, dim) and ESS treats the clones as chains — the standard
    multi-chain Stan/NumPyro estimator (infer/diagnostics.py:49).
    Tabulates what the reference reads off ``mcmc.print_summary()``
    (posteriordb_eight-schools.ipynb cells 27-29: n_eff 8.3k-10.3k of
    10k draws)."""
    from adaptive_mcmc_tpu.infer.diagnostics import effective_sample_size

    s, n, d = samples.shape
    f = max(1, int(fan_out))
    if n % f:
        f = 1
    x = jnp.asarray(samples).reshape(s, n // f, f, d)

    ess = jax.vmap(effective_sample_size)(x)  # (seeds, dim)
    # ESS cannot exceed the draw count; the estimator can overshoot on
    # slightly antithetic chains
    return np.minimum(np.asarray(ess), float(n))


def _wasserstein_worker(args):
    """Host-pool worker: exact 1-1 Wasserstein for one seed (cost matrix in
    numpy, assignment via the native/SciPy solver)."""
    x, y = args
    import scipy.spatial

    from adaptive_mcmc_tpu.metrics.assignment import linear_sum_assignment

    n = min(x.shape[0], y.shape[0])  # 1-1 coupling needs equal sizes
    cost = scipy.spatial.distance_matrix(x[:n], y[:n]).astype(np.float64)
    col = linear_sum_assignment(cost)
    return float(cost[np.arange(n), col].mean())


def evaluate_run(
    run_npz: str | Path,
    reference: np.ndarray,
    out_csv: Optional[str | Path] = None,
    *,
    n_workers: Optional[int] = None,
    exact_wasserstein_seeds: Optional[int] = None,
    exact_w_solver: str = "auction",
    exact_w_batch: int = 1,
    hungarian_check_seeds: int = 2,
    sinkhorn: bool = True,
    verbose: bool = False,
    checkpoint: Optional[str | Path] = None,
):
    """Per-seed metric rows for a saved w_eval run.  Returns a pandas
    DataFrame (and writes CSV if requested).

    Cost split: moment RMSE / MMD / Sinkhorn run on the accelerator for
    every seed.  The exact 1-1 Wasserstein runs for the first
    ``exact_wasserstein_seeds`` seeds (None = all) with the selected
    solver:

    * ``"auction"`` (default) — the on-device ε-auction (<1 s/seed at
      n=10k on a v5e chip; mean assigned cost within ε_final ≈
      range/(2e4) of optimal).  The first ``hungarian_check_seeds``
      seeds are ALSO solved with the exact host Hungarian and the two
      must agree to 2e-3 — a per-run guard against auction regressions.
      The default of 2 covers both the cold-start solve (seed 0) and a
      warm-started solve (seed 1, prices carried over), so a
      warm-start-specific regression is caught in production sweeps too.
    * ``"host"`` — exact Hungarian for every covered seed (O(n³), ~90
      s/seed/core at n=10k; process pool on multi-core hosts).

    ``checkpoint`` names a JSON side-file that persists the exact-W
    column after every solved batch, keyed by a cheap content signature
    of the npz.  A killed eval (queue timeout, tunnel drop) resumes
    mid-cell losing at most one batch of seeds — the finish-proofing
    the reference gets per-file from its skip-if-exists guard
    (run_diamonds_lr_decay.py:55-56), here at seed granularity."""
    import concurrent.futures as cf
    import os

    import pandas as pd

    from adaptive_mcmc_tpu.metrics.wasserstein import wasserstein_dist11_p

    with np.load(run_npz, allow_pickle=False) as data:
        samples = data["samples"]  # (seeds, draws, dim)
        meta = json.loads(str(data["meta"])) if "meta" in data else {}
    fan_out = int(meta.get("config", {}).get("fan_out", 1))
    S = samples.shape[0]
    y = jnp.asarray(reference)

    ck_path = Path(checkpoint) if checkpoint is not None else None
    ck_sig = [
        list(int(v) for v in samples.shape),
        float(np.asarray(samples[:, 0], np.float64).sum()),
    ]
    wass_resume: list[float] = []
    if ck_path is not None and ck_path.exists():
        try:
            st = json.loads(ck_path.read_text())
            if st.get("sig") == ck_sig:
                wass_resume = [float(v) for v in st["wass"]]
                if verbose and wass_resume:
                    print(
                        f"  [wasserstein] resuming at seed "
                        f"{len(wass_resume)} from {ck_path.name}",
                        flush=True,
                    )
        except Exception:
            pass

    def _ck_save(wass: list[float]):
        if ck_path is not None:
            ck_path.parent.mkdir(parents=True, exist_ok=True)
            ck_path.write_text(json.dumps({"sig": ck_sig, "wass": wass}))

    # rmse/mmd batched into ONE program each: per-seed dispatch costs
    # ~0.8 s over the remote-TPU tunnel, and mmd's bandwidth + y-y Gram
    # depend only on the (fixed) reference set
    from adaptive_mcmc_tpu.metrics.mmd import mmd_heuristic_many

    xs = jnp.asarray(samples)
    rmse = [
        float(v)
        for v in jax.vmap(lambda x: pth_moment_rmse(x, y, p=1.0))(xs)
    ]
    mmd = [float(v) for v in mmd_heuristic_many(xs, y)]
    sk = [
        float(wasserstein_sinkhorn(jnp.asarray(samples[s]), y))
        if sinkhorn
        else float("nan")
        for s in range(S)
    ]

    k = S if exact_wasserstein_seeds is None else min(
        S, exact_wasserstein_seeds
    )
    if exact_w_solver == "auction":
        from adaptive_mcmc_tpu.metrics.assignment import (
            auction_assignment_batch,
        )
        from adaptive_mcmc_tpu.metrics.wasserstein import (
            minkowski_cost_matrix,
        )

        n_draws = min(samples.shape[1], reference.shape[0])
        y_dev = jnp.asarray(reference[:n_draws])
        rows = jnp.arange(n_draws)
        wass = []
        B = max(1, int(exact_w_batch))

        def _check_tol(w_exact: float, pts: np.ndarray) -> float:
            # comparison noise + the auction's certified bound: mean
            # assigned cost is within eps_final = range/(2·n) of optimal,
            # which dominates at small n (tests) and vanishes at n=10k
            span = float(np.linalg.norm(
                np.max(pts, axis=0) - np.min(pts, axis=0)
            ))
            return 2e-3 * max(1.0, abs(w_exact)) + span / (2.0 * n_draws)
        if B == 1:
            prices = None  # warm-start duals: same reference set per seed
            wass = list(wass_resume[:k])
            for s in range(len(wass), k):
                w, prices = wasserstein_dist11_p(
                    jnp.asarray(samples[s, :n_draws]), y_dev,
                    solver="auction", prices_init=prices,
                    return_prices=True,
                )
                if s < hungarian_check_seeds:
                    w_exact = _wasserstein_worker(
                        (np.asarray(samples[s], np.float64),
                         np.asarray(reference, np.float64))
                    )
                    pts = np.concatenate(
                        [samples[s, :n_draws],
                         np.asarray(reference[:n_draws])]
                    )
                    if abs(w - w_exact) > _check_tol(w_exact, pts):
                        raise AssertionError(
                            f"auction W {w:.6f} disagrees with exact "
                            f"Hungarian {w_exact:.6f} on seed {s}"
                        )
                wass.append(float(w))
                _ck_save(wass)
                if verbose and (s + 1) % 20 == 0:
                    print(f"  [wasserstein] seed {s+1}/{k}", flush=True)
        else:
            # batches after the first warm-start from the previous
            # batch's duals (all instances share one reference set);
            # the Hungarian cross-check therefore also covers the first
            # warm-started seed (s == B), not just the cold batch
            prices = None
            wass = list(wass_resume[:k])
            for s0 in range(len(wass), k, B):
                idx = list(range(s0, min(s0 + B, k)))
                costs = jnp.stack([
                    minkowski_cost_matrix(
                        jnp.asarray(samples[s, :n_draws]), y_dev
                    )
                    for s in idx
                ])
                cols, prices = auction_assignment_batch(
                    costs, prices_init=prices, return_prices=True,
                )
                ws = [
                    float(jnp.mean(costs[i, rows, cols[i]]))
                    for i in range(len(idx))
                ]
                for i, s in enumerate(idx):
                    if s < hungarian_check_seeds or s == B:
                        w_exact = _wasserstein_worker(
                            (np.asarray(samples[s], np.float64),
                             np.asarray(reference, np.float64))
                        )
                        pts = np.concatenate(
                            [samples[s, :n_draws],
                             np.asarray(reference[:n_draws])]
                        )
                        if abs(ws[i] - w_exact) > _check_tol(w_exact, pts):
                            raise AssertionError(
                                f"auction W {ws[i]:.6f} disagrees with "
                                f"exact Hungarian {w_exact:.6f} on seed {s}"
                            )
                wass.extend(ws)
                _ck_save(wass)
                if verbose:
                    print(f"  [wasserstein] seed {len(wass)}/{k}",
                          flush=True)
    else:
        y_np = np.asarray(reference, np.float64)
        jobs = [(np.asarray(samples[s], np.float64), y_np) for s in range(k)]
        n_workers = n_workers or min(12, os.cpu_count() or 1)
        if n_workers > 1 and k > 1:
            import multiprocessing as mp

            # spawn (not fork): the parent holds a live TPU client; workers
            # only need numpy + the native solver.
            with cf.ProcessPoolExecutor(
                max_workers=n_workers, mp_context=mp.get_context("spawn")
            ) as pool:
                wass = list(pool.map(_wasserstein_worker, jobs, chunksize=1))
        else:
            wass = []
            for i, j in enumerate(jobs):
                wass.append(_wasserstein_worker(j))
                if verbose:
                    print(f"  [wasserstein] seed {i+1}/{k}", flush=True)
    wass += [float("nan")] * (S - k)

    ess = ess_columns(samples, fan_out)  # (seeds, dim)
    df = pd.DataFrame(
        {
            "rng_seed": np.arange(S),
            "rmse_means": rmse,
            "wasserstein": wass,
            "sinkhorn": sk,
            "mmd": mmd,
            "ess_median": np.median(ess, axis=1),
            "ess_min": np.min(ess, axis=1),
        }
    )
    if out_csv is not None:
        Path(out_csv).parent.mkdir(parents=True, exist_ok=True)
        df.to_csv(out_csv)
    return df
