#!/bin/bash
# Round-4 regeneration queue — finish-proof edition (VERDICT r3 #1/#3).
#
# Differences from tpu_queue_r3b.sh, which twice died mid-eval:
#   * SWEEPS FIRST: every cell's draws + cold/warm walls land on disk
#     before any eval starts (fastest-evidence-first ordering).
#   * RESUMABLE EVALS: evaluate_run checkpoints the exact-W column per
#     8-seed batch (wck_<kernel>.json next to the npz); regen_cells
#     skips finished sweeps/evals, so each cell runs in a bounded-retry
#     loop where a timeout loses at most one batch of seeds.
#   * merge_results after every step keeps RESULTS.md current and
#     backfills ESS for cells evaluated before the ESS columns existed.
set -u
cd /root/repo
LOG=/tmp/tpu_queue_r4.log
export AMT_ARWMH_FUSED=0
unset AMT_ASSS_FUSED 2>/dev/null || true
export AMT_EVAL_W_BATCH=8

CELLS="eight_schools/arwmh eight_schools/asss eight_schools/nuts
       eight_schools/sa
       kidiq/arwmh kidiq/asss kidiq/nuts
       diamonds/arwmh diamonds/nuts diamonds/asss"

echo "=== tpu_queue_r4 start $(date) ===" | tee -a "$LOG"

# 0. wait for any in-flight regen (round-3 leftover) to release the chip
while pgrep -u root -f "python scripts/regen_cells[.]py" >/dev/null 2>&1; do
  echo "waiting for in-flight regen to finish $(date)" | tee -a "$LOG"
  sleep 60
done

cell_done () {  # cell_done <target/kernel> <field>
  python - "$1" "$2" <<'EOF'
import json, sys
cell, field = sys.argv[1], sys.argv[2]
key = cell.replace('/', '|')
try:
    e = json.load(open('mcmc_runs/results_state.json')).get(key, {})
except Exception:
    e = {}
ok = e.get(field) is not None
sys.exit(0 if ok else 1)
EOF
}

# 1. sweeps for every cell (skip-eval; cells with walls+npz skip instantly)
for cell in $CELLS; do
  if cell_done "$cell" wall_cold; then
    echo "--- sweep $cell already done ---" | tee -a "$LOG"
    continue
  fi
  echo "--- sweep $cell $(date) ---" | tee -a "$LOG"
  for attempt in 1 2; do
    timeout 3600 python scripts/regen_cells.py --cells "$cell" \
      --skip-eval >>"$LOG" 2>&1 && break
    echo "sweep $cell attempt $attempt FAILED" | tee -a "$LOG"
  done
  timeout 600 python scripts/merge_results.py >>"$LOG" 2>&1 || true
done

# 2. evals, resumable, bounded retries per cell
for cell in $CELLS; do
  for attempt in 1 2 3 4; do
    if cell_done "$cell" rmse_mean; then break; fi
    echo "--- eval $cell attempt $attempt $(date) ---" | tee -a "$LOG"
    timeout 7200 python scripts/regen_cells.py --cells "$cell" \
      >>"$LOG" 2>&1 || echo "eval $cell attempt $attempt ended without row" \
      | tee -a "$LOG"
    timeout 600 python scripts/merge_results.py >>"$LOG" 2>&1 || true
  done
done

# 3. per-step cost breakdown -> PERF.md rows (incl. ASSS trip counts)
echo "--- perf breakdown $(date) ---" | tee -a "$LOG"
timeout 1800 python scripts/perf_breakdown.py >>"$LOG" 2>&1 \
  || echo "FAILED perf_breakdown" | tee -a "$LOG"

# 4. full lr_decay family (diamonds-first inside the script)
echo "--- lr_decay ALL $(date) ---" | tee -a "$LOG"
timeout 28800 python scripts/run_lr_decay_sweeps.py \
  >>"$LOG" 2>&1 || echo "FAILED lr_decay" | tee -a "$LOG"

# 5. artifact-driven figures from the fresh artifacts
echo "--- artifact figures $(date) ---" | tee -a "$LOG"
timeout 3600 python -m adaptive_mcmc_tpu.analysis.artifact_figures img \
  >>"$LOG" 2>&1 || echo "FAILED artifact figures" | tee -a "$LOG"

echo "--- merge results $(date) ---" | tee -a "$LOG"
timeout 600 python scripts/merge_results.py >>"$LOG" 2>&1 \
  || echo "FAILED merge_results" | tee -a "$LOG"

echo "=== tpu_queue_r4 done $(date) ===" | tee -a "$LOG"
python - <<'EOF' | tee -a "$LOG"
import json
state = json.load(open('mcmc_runs/results_state.json'))
for k in sorted(state):
    e = state[k]
    print(k, {x: e.get(x) for x in ('wall', 'wall_cold', 'rate', 'driver',
                                    'rmse_mean', 'w_mean', 'ess_med',
                                    'eval_error')})
EOF
