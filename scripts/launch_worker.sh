#!/bin/bash
# Retry wrapper for tpu_worker.py (same rationale as launch_campaign.sh):
# axon's register() can fail transiently leaving the backend unregistered;
# retry with backoff.  Exit 2 = backend poisoned (RESOURCE_EXHAUSTED) ->
# restart immediately (fresh process, fresh warmup).  No outer timeout.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=${1:-/tmp/lcpc_r4_worker.log}
for attempt in $(seq 1 24); do
  echo "=== worker attempt $attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
  python -u scripts/tpu_worker.py >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then echo "=== worker stopped cleanly ===" >> "$LOG"; exit 0; fi
  if [ $rc -eq 2 ]; then
    echo "=== worker poisoned; restarting in 30s ===" >> "$LOG"
    sleep 30
  else
    echo "=== worker died rc=$rc; backoff 180s ===" >> "$LOG"
    sleep 180
  fi
done
echo "=== giving up after 24 attempts ===" >> "$LOG"
exit 1
