#!/bin/bash
# Detached TPU watcher: polls the axon tunnel and fires the round-3 work
# queue exactly once when it comes back.  Designed to survive the
# interactive session (start with: setsid nohup bash scripts/tpu_watch.sh
# >/tmp/tpu_watch.log 2>&1 & echo $! > /tmp/tpu_watch.pid).
set -u
cd /root/repo
LOCK=/tmp/tpu_queue.lock
for i in $(seq 1 400); do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    touch /tmp/tpu_up
    if mkdir "$LOCK" 2>/dev/null; then
      echo "TPU up at $(date) — running queue (watcher pid $$)"
      bash scripts/tpu_queue_r3.sh
      echo "queue finished at $(date)"
    else
      echo "TPU up but queue lock held — another runner owns it"
    fi
    exit 0
  fi
  sleep 80
done
echo "watcher gave up after $(date)"
