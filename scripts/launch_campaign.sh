#!/bin/bash
# Retry wrapper for r3_campaign.py: the axon plugin's register() swallows
# transient tunnel errors, leaving the backend unregistered and the process
# dead on first device use.  Retry with backoff until the campaign gets past
# warmup; once warmed, run to completion (no outer timeout — killing
# mid-Mosaic-compile wedges the tunnel).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=${1:-/tmp/campaign_r3.log}
shift || true
for attempt in $(seq 1 12); do
  echo "=== attempt $attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
  python -u "scripts/${CAMPAIGN:-r4_campaign}.py" "$@" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then echo "=== campaign finished rc=0 ===" >> "$LOG"; exit 0; fi
  if grep -q "not in the list of known backends" "$LOG"; then
    echo "=== register failed (rc=$rc); backoff 180s ===" >> "$LOG"
    sleep 180
  else
    echo "=== campaign died rc=$rc (not a register failure); backoff 300s and resume ===" >> "$LOG"
    sleep 300
  fi
done
echo "=== giving up after 12 attempts ===" >> "$LOG"
exit 1
