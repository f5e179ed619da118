"""Metric-algorithm benchmark harness (smoke, tiny grid)."""

from adaptive_mcmc_tpu.experiments.compare_wasserstein import run


def test_compare_wasserstein_tiny(tmp_path):
    df = run(ns=(30, 60), ds=(3,), out_csv=tmp_path / "cw.csv")
    assert set(df.columns) == {"algorithm", "n", "d", "seconds", "value"}
    # every algorithm produced a finite value on the tiny grid
    assert df["value"].notna().all()
    assert (df["seconds"] >= 0).all()
    algos = set(df["algorithm"])
    assert {"hungarian", "auction", "sinkhorn_default",
            "max_sliced_100", "mmd_heuristic"} <= algos
    # exact solvers agree with each other
    h = df[(df.algorithm == "hungarian") & (df.n == 60)]["value"].iloc[0]
    a = df[(df.algorithm == "auction") & (df.n == 60)]["value"].iloc[0]
    assert abs(h - a) / h < 0.05
