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

from run_full_sweeps import summarize  # noqa: E402


def main(out_dir: str = "mcmc_runs", results_md: str = "RESULTS.md"):
    out = Path(out_dir)
    results = {}
    for f in sorted(out.glob("results_state*.json")):
        for k, v in json.loads(f.read_text()).items():
            results[tuple(k.split("|"))] = v
    summarize(results, Path(results_md))


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main(*sys.argv[1:])
