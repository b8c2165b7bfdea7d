#!/usr/bin/env bash
# Round-4 sequential TPU job queue (CLAUDE.md: ONE JAX process at a time).
# Waits for the grid3 stall-guard to exit, then runs the precision study,
# the roofline measurements, and a fresh bench — each bounded by `timeout`
# (a wedged tunnel dispatch otherwise hangs forever), each retried once
# after a 5-minute wait if the first attempt fails.
set -u
cd "$(dirname "$0")/.."

GUARD_PID_FILE="${1:-/tmp/grid3_guard.pid}"
if [ -f "$GUARD_PID_FILE" ]; then
  GPID=$(cat "$GUARD_PID_FILE")
  while kill -0 "$GPID" 2>/dev/null; do sleep 60; done
fi
echo "[queue] grid3 guard done at $(date)" | tee -a /tmp/tpu_queue_r4.log

run_bounded() { # name, timeout_s, cmd...
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2; do
    echo "[queue] $name attempt $attempt: $*" >> /tmp/tpu_queue_r4.log
    if timeout "$tmo" "$@"; then
      echo "[queue] $name ok" >> /tmp/tpu_queue_r4.log
      return 0
    fi
    echo "[queue] $name failed (rc=$?); sleeping 300s" >> /tmp/tpu_queue_r4.log
    sleep 300
  done
  echo "[queue] $name FAILED twice" >> /tmp/tpu_queue_r4.log
  return 1
}

run_bounded precision 4800 bash -c 'python -u scripts/precision_study.py > precstudy.log 2>&1'
run_bounded roofline 4800 bash -c 'python -u scripts/roofline.py > roofline.log 2>&1'
run_bounded bench 7200 bash -c 'python -u bench.py > bench_r04.log 2>&1'
echo "[queue] ALL DONE at $(date)" | tee -a /tmp/tpu_queue_r4.log
