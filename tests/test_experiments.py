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
