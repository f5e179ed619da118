"""Merge the main sweep's results_state.json with any host-eval side
state files (results_state_<target>_host.json) and regenerate RESULTS.md.

Run:  python scripts/merge_results.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

# Everything here (ESS FFTs, table rendering) is host work; grabbing the
# remote TPU would contend with whatever sweep/eval is running.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from run_full_sweeps import summarize  # noqa: E402


def _backfill_ess(out: Path) -> bool:
    """Compute the ESS fields for evaluated cells that predate the ESS
    columns (VERDICT r3 #4).  Needs only the saved draws; writes back
    into mcmc_runs/results_state.json so it runs once per cell."""
    import numpy as np

    state_file = out / "results_state.json"
    if not state_file.exists():
        return False
    state = json.loads(state_file.read_text())
    changed = False
    for key, entry in state.items():
        if entry.get("ess_med") is not None or entry.get("wall") is None:
            continue
        target, kernel = key.split("|")
        npz = out / "w_eval" / target / f"{kernel}.npz"
        if not npz.exists():
            continue
        from adaptive_mcmc_tpu.experiments.evaluate import ess_columns

        with np.load(npz, allow_pickle=False) as d:
            samples = d["samples"]
            meta = json.loads(str(d["meta"]))
        fan = int(meta.get("config", {}).get("fan_out", 1))
        ess = ess_columns(samples, fan)           # (seeds, dim)
        med = np.median(ess, axis=1)              # per-seed median-dim
        entry["ess_med"] = float(np.median(med))
        entry["ess_min"] = float(ess.min())
        entry["ess_per_sec"] = float(med.sum() / entry["wall"])
        print(f"[ess-backfill] {key}: med={entry['ess_med']:.0f} "
              f"min={entry['ess_min']:.0f} "
              f"ess/s={entry['ess_per_sec']:,.0f}")
        changed = True
    if changed:
        state_file.write_text(json.dumps(state))
    return changed


def main(out_dir: str = "mcmc_runs", results_md: str = "RESULTS.md"):
    out = Path(out_dir)
    _backfill_ess(out)
    results = {}
    for f in sorted(out.glob("results_state*.json")):
        for k, v in json.loads(f.read_text()).items():
            results[tuple(k.split("|"))] = v
    summarize(results, Path(results_md))


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main(*sys.argv[1:])
