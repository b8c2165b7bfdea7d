#!/usr/bin/env bash
# Round-5 stage-3 TPU queue: runs after the NUTS checkpoint refill releases
# the chip (CLAUDE.md: ONE JAX process at a time).
#
# 1. roofline cost/pgd sections re-measured AMORTIZED (the first r5 run's
#    single-dispatch unit timings only measured the ~27.6 ms tunnel floor),
#    plus the extended NUTS chunk ablation with order control;
# 2. fresh bench at the new "high" sampler-precision default (the headline
#    table refresh + BENCH_r05 must reflect shipped defaults).
#
# Usage: bash scripts/tpu_queue_r5b.sh [guard_pid_file] [queue_log]
set -u
cd "$(dirname "$0")/.."

GUARD_PID_FILE="${1:-/tmp/refill_guard.pid}"
QLOG="${2:-/tmp/tpu_queue_r5b.log}"
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

run_bounded roofline2 4800 bash -c \
  'python -u scripts/roofline.py --only=cost,pgd,nuts --force=cost,pgd,nuts >> roofline.log 2>&1'
run_bounded bench2 7200 bash -c 'python -u bench.py > bench_r05.log 2>&1'
echo "[queue] ALL DONE at $(date)" | tee -a "$QLOG"
