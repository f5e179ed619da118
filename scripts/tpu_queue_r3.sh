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

# 2. single-provenance cell regeneration (cold+warm walls + eval rows
#    from exactly those draws): VERDICT next #1/#3/#5/#6/#7/#9.
#    eight_schools first (fast, highest-visibility walls), then kidiq
#    (batched-auction exact W), then diamonds (new real posterior).
for cell in eight_schools/arwmh eight_schools/asss eight_schools/nuts \
            eight_schools/sa \
            kidiq/arwmh kidiq/asss kidiq/nuts \
            diamonds/nuts diamonds/asss diamonds/arwmh; do
  echo "--- regen $cell $(date) ---" | tee -a "$LOG"
  timeout 5400 python scripts/regen_cells.py --cells "$cell" \
    >>"$LOG" 2>&1 || echo "FAILED $cell" | tee -a "$LOG"
done

echo "=== tpu_queue_r3 done $(date) ===" | tee -a "$LOG"
python - <<'EOF' | tee -a "$LOG"
import json
state = json.load(open('mcmc_runs/results_state.json'))
for k in sorted(state):
    e = state[k]
    print(k, {x: e.get(x) for x in ('wall', 'wall_cold', 'rate', 'driver',
                                    'rmse_mean', 'w_mean', 'eval_error')})
EOF
