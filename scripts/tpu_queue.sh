#!/usr/bin/env bash
# Sequential TPU job queue (CLAUDE.md: ONE JAX process at a time).
# Optionally waits for a stall-guard PID to exit, then runs each queued job
# bounded by `timeout -k` (SIGKILL escalation: a dispatch wedged in a futex
# wait may never process SIGTERM), each retried once after a 5-minute wait
# if the first attempt fails.
#
# Usage: bash scripts/tpu_queue.sh [guard_pid_file] [queue_log]
set -u
cd "$(dirname "$0")/.."

GUARD_PID_FILE="${1:-/tmp/grid3_guard.pid}"
QLOG="${2:-/tmp/tpu_queue.log}"
if [ -f "$GUARD_PID_FILE" ]; then
  GPID=$(cat "$GUARD_PID_FILE")
  while kill -0 "$GPID" 2>/dev/null; do sleep 60; done
fi
echo "[queue] guard done at $(date)" | tee -a "$QLOG"

run_bounded() { # name, timeout_s, cmd...
  local name="$1" tmo="$2" rc; shift 2
  for attempt in 1 2; do
    echo "[queue] $name attempt $attempt: $*" >> "$QLOG"
    timeout -k 60 "$tmo" "$@"
    rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "[queue] $name ok" >> "$QLOG"
      return 0
    fi
    echo "[queue] $name failed (rc=$rc)" >> "$QLOG"
    [ "$attempt" -lt 2 ] && sleep 300
  done
  echo "[queue] $name FAILED twice" >> "$QLOG"
  return 1
}

run_bounded precision 4800 bash -c 'python -u scripts/precision_study.py > precstudy.log 2>&1'
run_bounded roofline 4800 bash -c 'python -u scripts/roofline.py > roofline.log 2>&1'
run_bounded bench 7200 bash -c 'python -u bench.py > bench_r05.log 2>&1'
echo "[queue] ALL DONE at $(date)" | tee -a "$QLOG"
