#!/bin/bash
# Round-3 FULL regeneration queue (replaces tpu_queue_r3.sh).
#
# The build container was recreated mid-round: mcmc_runs/ (never
# committed — multi-GB npz artifacts) was lost, so the incremental r3
# queue's assumptions (kidiq backup, partial regen, existing
# results_state.json) no longer hold.  This queue rebuilds EVERYTHING
# from the committed code: all 10 w_eval cells, the full lr_decay
# family (3 targets x 2 kernels x 3 decays), the per-step perf
# breakdown, and the artifact-driven figures.
#
# Fused Pallas whole-step kernels are DISABLED here (AMT_ARWMH_FUSED=0,
# AMT_ASSS_FUSED unset): first hardware contact showed a scoped-VMEM
# overrun (arwmh_fused at 4096 chains) and a Mosaic shape mismatch
# (asss_fused) — tracked separately; the XLA step_n/lockstep drivers
# already clear every perf bar (bench probe 2026-08-18: NUTS 1.56M
# it/s = 149.9x, ASSS 50.7M = 1196x, ARWMH 221.9M = 3984x).
set -u
cd /root/repo
LOG=/tmp/tpu_queue.log
export AMT_ARWMH_FUSED=0
unset AMT_ASSS_FUSED 2>/dev/null || true
# Batch the eval auction over 8 seeds per device program for ALL targets:
# the single-instance solver re-enters from the host every ~512 rounds and
# each re-entry pays the ~0.8 s tunnel round-trip (measured ~60 s/seed on
# eight-schools), while the batched rounds amortize that 8 ways (the
# proven kidiq path).  The per-cell Hungarian cross-check still guards
# seeds 0-1.
export AMT_EVAL_W_BATCH=8
echo "=== tpu_queue_r3b start $(date) ===" | tee -a "$LOG"

# 1. w_eval cells, fastest/highest-visibility first.  Each regen does
#    cold+warm passes + single-provenance eval rows (VERDICT r2 #3/#5).
for cell in eight_schools/arwmh eight_schools/asss eight_schools/nuts \
            eight_schools/sa \
            kidiq/arwmh kidiq/asss kidiq/nuts \
            diamonds/arwmh diamonds/nuts diamonds/asss; do
  echo "--- regen $cell $(date) ---" | tee -a "$LOG"
  timeout 5400 python scripts/regen_cells.py --cells "$cell" \
    >>"$LOG" 2>&1 || echo "FAILED $cell" | tee -a "$LOG"
  timeout 300 python scripts/merge_results.py >>"$LOG" 2>&1 || true
done

# 2. per-step cost breakdown -> PERF.md rows
echo "--- perf breakdown $(date) ---" | tee -a "$LOG"
timeout 1800 python scripts/perf_breakdown.py >>"$LOG" 2>&1 \
  || echo "FAILED perf_breakdown" | tee -a "$LOG"

# 3. full lr_decay family (all targets — every artifact was lost)
echo "--- lr_decay ALL $(date) ---" | tee -a "$LOG"
timeout 28800 python scripts/run_lr_decay_sweeps.py \
  >>"$LOG" 2>&1 || echo "FAILED lr_decay" | tee -a "$LOG"

# 4. artifact-driven figures from the fresh artifacts
echo "--- artifact figures $(date) ---" | tee -a "$LOG"
timeout 3600 python -m adaptive_mcmc_tpu.analysis.artifact_figures img \
  >>"$LOG" 2>&1 || echo "FAILED artifact figures" | tee -a "$LOG"

echo "--- merge results $(date) ---" | tee -a "$LOG"
timeout 600 python scripts/merge_results.py >>"$LOG" 2>&1 \
  || echo "FAILED merge_results" | tee -a "$LOG"

echo "=== tpu_queue_r3b done $(date) ===" | tee -a "$LOG"
python - <<'EOF' | tee -a "$LOG"
import json
state = json.load(open('mcmc_runs/results_state.json'))
for k in sorted(state):
    e = state[k]
    print(k, {x: e.get(x) for x in ('wall', 'wall_cold', 'rate', 'driver',
                                    'rmse_mean', 'w_mean', 'eval_error')})
EOF
