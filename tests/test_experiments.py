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
