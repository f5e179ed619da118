#!/bin/bash
# Round-3 TPU work queue: fires once the axon tunnel is back.
# Each step is timeout-bounded and failure-isolated so one bad cell
# cannot wedge the rest of the queue.  Progress tees to /tmp/tpu_queue.log.
set -u
cd /root/repo
LOG=/tmp/tpu_queue.log
echo "=== tpu_queue_r3 start $(date) ===" | tee -a "$LOG"

# 1. bench probe: verifies the pipelined NUTS / chains-last ASSS /
#    fused ARWMH drivers clear the perf bar (VERDICT r2 next #1).
timeout 1200 python bench.py 2>>"$LOG" | tee /tmp/bench_r3_probe.json | tee -a "$LOG"

# 1b. unroll-factor probe: measures step rate vs K so the ES cells can
#     be re-run with AMT_PIPELINE_UNROLL if a clearly better K exists.
echo "--- tune_unroll $(date) ---" | tee -a "$LOG"
timeout 1800 python scripts/tune_unroll.py 2>&1 | tee -a "$LOG" \
  || echo "FAILED tune_unroll" | tee -a "$LOG"

# 2. single-provenance cell regeneration (cold+warm walls + eval rows
#    from exactly those draws): VERDICT next #1/#3/#5/#6/#7/#9.
#    eight_schools first (fast, highest-visibility walls), then kidiq
#    (batched-auction exact W), then diamonds (new real posterior).
# kidiq rows are currently COMPLETE (100-seed exact W, backfilled by the
# host Hungarian) but grade pre-rewrite draws; regen overwrites the npz,
# so keep a restorable copy in case the batched-auction eval fails.
[ -d mcmc_runs/w_eval/kidiq.r2backup ] || \
  cp -r mcmc_runs/w_eval/kidiq mcmc_runs/w_eval/kidiq.r2backup

# diamonds/arwmh is omitted: already regenerated against the real
# posterior earlier this round (results_state has its cold+warm walls
# and eval rows; driver=lockstep is final for d=26 — fused gate is d<=16)
for cell in eight_schools/arwmh eight_schools/asss eight_schools/nuts \
            eight_schools/sa \
            kidiq/arwmh kidiq/asss kidiq/nuts \
            diamonds/nuts diamonds/asss; do
  echo "--- regen $cell $(date) ---" | tee -a "$LOG"
  timeout 5400 python scripts/regen_cells.py --cells "$cell" \
    >>"$LOG" 2>&1 || echo "FAILED $cell" | tee -a "$LOG"
  # incremental RESULTS.md so a round-boundary cutoff still leaves the
  # finished cells published (merge is instant: pure-JSON -> markdown)
  timeout 300 python scripts/merge_results.py >>"$LOG" 2>&1 || true
done

if grep -q '"eval_error"' mcmc_runs/results_state.json; then
  echo "NOTE: some cells have eval_error — kidiq backup retained at" \
       "mcmc_runs/w_eval/kidiq.r2backup (restore npz+csv if needed)" \
       | tee -a "$LOG"
fi

# 2b. per-step cost breakdown -> PERF.md (now incl. pipelined-driver
#     rows at the sweep shape)
echo "--- perf breakdown $(date) ---" | tee -a "$LOG"
timeout 1800 python scripts/perf_breakdown.py >>"$LOG" 2>&1 \
  || echo "FAILED perf_breakdown" | tee -a "$LOG"

# 3. lr_decay diamonds family: the round-2 artifacts were generated
#    from the old ad-hoc synthetic target; the real-posterior
#    reconstruction (6813ad5) obsoleted them.  Re-run at full scale.
echo "--- lr_decay diamonds $(date) ---" | tee -a "$LOG"
timeout 14400 python scripts/run_lr_decay_sweeps.py --targets diamonds \
  >>"$LOG" 2>&1 || echo "FAILED lr_decay diamonds" | tee -a "$LOG"

# 4. regenerate artifact-driven figures (pe-lr / adaptation-lr /
#    metric boxplots / phi-eval / posterior-predictive) from the new
#    artifacts for every target.
echo "--- artifact figures $(date) ---" | tee -a "$LOG"
timeout 3600 python -m adaptive_mcmc_tpu.analysis.artifact_figures img \
  >>"$LOG" 2>&1 || echo "FAILED artifact figures" | tee -a "$LOG"

# 5. regenerate RESULTS.md from the updated state files.  The kidiq
#    host side-state (results_state_kidiq_host.json) grades the
#    PRE-regen draws; merge_results lets side files win, so archive it
#    for any kidiq cell whose regen eval succeeded (fresh batched-
#    auction rows in the main state must not be masked by stale ones).
python - <<'PYEOF' 2>>"$LOG" | tee -a "$LOG"
import json
from pathlib import Path
main = json.loads(Path('mcmc_runs/results_state.json').read_text())
side_p = Path('mcmc_runs/results_state_kidiq_host.json')
if side_p.exists():
    side = json.loads(side_p.read_text())
    fresh = [k for k in side
             if main.get(k, {}).get('w_mean') is not None
             and main.get(k, {}).get('driver')
             and 'eval_error' not in main.get(k, {})]
    for k in fresh:
        side.pop(k)
    if fresh:
        print(f"[merge-prep] dropping stale host rows for {fresh}")
    if side:
        side_p.write_text(json.dumps(side))
    else:
        side_p.rename(side_p.with_suffix('.json.pre_r3'))
PYEOF

echo "--- merge results $(date) ---" | tee -a "$LOG"
timeout 600 python scripts/merge_results.py >>"$LOG" 2>&1 \
  || echo "FAILED merge_results" | tee -a "$LOG"

echo "=== tpu_queue_r3 done $(date) ===" | tee -a "$LOG"
python - <<'EOF' | tee -a "$LOG"
import json
state = json.load(open('mcmc_runs/results_state.json'))
for k in sorted(state):
    e = state[k]
    print(k, {x: e.get(x) for x in ('wall', 'wall_cold', 'rate', 'driver',
                                    'rmse_mean', 'w_mean', 'eval_error')})
EOF
