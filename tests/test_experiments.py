"""Experiment harness: CLI smoke runs, restartability, evaluation CSV."""

import numpy as np
import pandas as pd
import pytest

from adaptive_mcmc_tpu.experiments.cli import main
from adaptive_mcmc_tpu.experiments.configs import RunConfig, w_eval_config


def test_config_roundtrip():
    cfg = w_eval_config("eight_schools", "arwmh")
    assert cfg.num_warmup == 50_000 and cfg.thinning == 50
    cfg2 = RunConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_w_eval_and_evaluate_smoke(tmp_path):
    d = str(tmp_path)
    main(["w_eval", "--target", "eight_schools", "--kernel", "arwmh",
          "--seeds", "8", "--scale", "0.001", "--out-dir", d])
    npz = tmp_path / "w_eval" / "eight_schools" / "arwmh.npz"
    assert npz.exists()
    with np.load(npz, allow_pickle=False) as data:
        assert data["samples"].shape[0] == 8
        assert data["samples"].shape[2] == 10

    # idempotent restart: second invocation skips
    main(["w_eval", "--target", "eight_schools", "--kernel", "arwmh",
          "--seeds", "8", "--scale", "0.001", "--out-dir", d])

    main(["evaluate", "--target", "eight_schools", "--kernel", "arwmh",
          "--out-dir", d, "--ref-kernel", "asss", "--ref-draws", "1000"])
    csv = tmp_path / "w_eval" / "eight_schools" / "eval_arwmh.csv"
    df = pd.read_csv(csv)
    assert set(df.columns) >= {"rng_seed", "rmse_means", "wasserstein", "mmd"}
    assert len(df) == 8
    assert np.isfinite(df["wasserstein"]).all()


def test_lr_decay_smoke(tmp_path):
    main(["lr_decay", "--target", "eight_schools_centered",
          "--kernel", "asss", "--n-pow", "2", "--seeds", "4",
          "--out-dir", str(tmp_path)])
    base = tmp_path / "lr_decay" / "eight_schools_centered" / "asss"
    files = sorted(p.name for p in base.glob("decay_*.npz"))
    assert len(files) == 3
    with np.load(base / "decay_1.npz", allow_pickle=False) as data:
        assert data["as_change"].shape[1] == 4
        assert (np.diff(data["i"]) > 0).all()


def test_cli_scaled_budget():
    """--scale shrinks reference budgets proportionally while keeping
    num_samples a multiple of thinning (so the thinned draw count is
    exact) and never zeroing a phase."""
    from adaptive_mcmc_tpu.experiments.cli import _scaled_budget
    from adaptive_mcmc_tpu.experiments.configs import W_EVAL_BUDGETS

    full = _scaled_budget("eight_schools", "arwmh", 1.0)
    assert full == W_EVAL_BUDGETS[("eight_schools", "arwmh")]
    tiny = _scaled_budget("eight_schools", "arwmh", 1e-6)
    assert tiny["num_warmup"] >= 1
    assert tiny["num_samples"] >= tiny["thinning"]
    assert tiny["num_samples"] % tiny["thinning"] == 0
    half = _scaled_budget("eight_schools", "asss", 0.5)
    assert half["num_warmup"] == \
        W_EVAL_BUDGETS[("eight_schools", "asss")]["num_warmup"] // 2
    # rwm aliases the arwmh budget (frozen-proposal variant)
    assert _scaled_budget("eight_schools", "rwm", 1.0) == \
        W_EVAL_BUDGETS[("eight_schools", "arwmh")]


def _fake_run_npz(path, n_seeds=6, n_draws=240, dim=3, fan_out=1, rho=0.0,
                  seed=0):
    """Synthetic w_eval npz: per-seed AR(rho) Gaussian draws + meta."""
    import json

    rng = np.random.default_rng(seed)
    eps = rng.standard_normal((n_seeds, n_draws, dim)).astype(np.float32)
    x = np.empty_like(eps)
    x[:, 0] = eps[:, 0]
    for t in range(1, n_draws):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
    meta = {"config": {"fan_out": fan_out}, "wall_seconds": 1.0,
            "chain_iters_per_sec": 1.0, "driver": "test"}
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, samples=x, meta=json.dumps(meta))
    return x


def test_evaluate_checkpoint_resume_and_ess(tmp_path):
    """The exact-W column checkpoints per batch and resumes after a kill
    (VERDICT r3 #3); ESS columns land in the CSV (VERDICT r3 #4)."""
    import json

    from adaptive_mcmc_tpu.experiments.evaluate import evaluate_run

    npz = tmp_path / "w_eval" / "t" / "k.npz"
    _fake_run_npz(npz, n_seeds=6, n_draws=240, dim=3)
    ref = np.random.default_rng(99).standard_normal((240, 3)).astype(
        np.float32
    )
    ck = tmp_path / "wck.json"

    # pass 1: "killed" after 4 of 6 seeds (simulated via seed cap)
    df1 = evaluate_run(
        npz, ref, exact_wasserstein_seeds=4, exact_w_batch=2,
        sinkhorn=False, checkpoint=ck, hungarian_check_seeds=1,
    )
    st = json.loads(ck.read_text())
    assert len(st["wass"]) == 4

    # pass 2: resumes — first 4 seeds come from the checkpoint verbatim
    df2 = evaluate_run(
        npz, ref, exact_w_batch=2, sinkhorn=False, checkpoint=ck,
        hungarian_check_seeds=0,
    )
    assert np.allclose(
        df2["wasserstein"][:4], df1["wasserstein"][:4], rtol=0, atol=0
    )
    assert np.isfinite(df2["wasserstein"]).all()

    # fresh solve agrees within the auction's certified eps_final slack
    df3 = evaluate_run(
        npz, ref, exact_w_batch=2, sinkhorn=False,
        hungarian_check_seeds=0,
    )
    span = float(np.linalg.norm(ref.max(0) - ref.min(0))) * 2
    assert np.allclose(
        df3["wasserstein"], df2["wasserstein"], atol=span / 240
    )

    # a different npz invalidates the checkpoint signature
    _fake_run_npz(npz, n_seeds=6, n_draws=240, dim=3, seed=7)
    df4 = evaluate_run(
        npz, ref, exact_wasserstein_seeds=2, exact_w_batch=2,
        sinkhorn=False, checkpoint=ck, hungarian_check_seeds=0,
    )
    assert not np.allclose(df4["wasserstein"][:2], df1["wasserstein"][:2])

    # ESS columns: iid draws sit near the draw count, AR(0.95) far below
    assert {"ess_median", "ess_min"} <= set(df1.columns)
    assert df1["ess_median"].median() > 0.5 * 240
    npz2 = tmp_path / "w_eval" / "t" / "k2.npz"
    _fake_run_npz(npz2, n_seeds=4, n_draws=240, dim=3, rho=0.95)
    df5 = evaluate_run(
        npz2, ref, exact_wasserstein_seeds=0, sinkhorn=False,
        hungarian_check_seeds=0,
    )
    assert df5["ess_median"].median() < 0.25 * 240


def test_ess_columns_fan_out():
    """fan_out>1 must un-interleave the clones before measuring
    autocorrelation: frame-major interleaving of F independent AR(0.9)
    chains looks nearly iid to a fan-naive single-chain estimator
    (consecutive pooled draws come from different chains), so the naive
    ESS is wildly optimistic while the fan-aware ESS stays near
    F x the per-chain ESS."""
    from adaptive_mcmc_tpu.experiments.evaluate import ess_columns

    rng = np.random.default_rng(3)
    frames, F, d, rho = 400, 4, 2, 0.9
    eps = rng.standard_normal((frames, F, d)).astype(np.float32)
    x = np.empty_like(eps)
    x[0] = eps[0]
    for t in range(1, frames):
        x[t] = rho * x[t - 1] + np.sqrt(1 - rho**2) * eps[t]
    pooled = x.reshape(1, frames * F, d)  # frame-major interleave

    ess_fan = ess_columns(pooled, fan_out=F)
    ess_naive = ess_columns(pooled, fan_out=1)
    # AR(0.9): tau ~ (1+rho)/(1-rho) = 19 -> per-chain ESS ~ frames/19
    assert ess_fan.max() < 0.5 * ess_naive.min()
    per_chain = frames * (1 - rho) / (1 + rho)
    assert 0.3 * F * per_chain < ess_fan.min()
    assert ess_fan.max() < 3.0 * F * per_chain
    # non-divisible fan falls back to single-chain treatment
    odd = ess_columns(pooled[:, : frames * F - 1], fan_out=F)
    assert odd.shape == (1, d)
