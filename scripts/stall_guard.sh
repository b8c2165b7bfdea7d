#!/usr/bin/env bash
# Stall-guarded runner for long TPU jobs on this box (CLAUDE.md: the remote
# tunnel can wedge a dispatch in a futex wait without tripping the drop
# detector, leaving a sweep silent forever).
#
# Usage: bash scripts/stall_guard.sh <logfile> <cmd...>
#
# Runs <cmd> appending to <logfile>. If the log goes quiet for more than
# $STALL_SECS (default 1500 = 25 min), kills the job BY PID (never by
# pattern) and relaunches. Before each (re)launch, probes TPU health with a
# tiny matmul + host transfer (jax.devices() alone does not detect wedges);
# while the probe fails, waits and retries. The guarded command must be
# restart-safe (grid3.py is: checkpoint+CSV-keyed cell skipping).
set -u
LOG="$1"; shift
STALL_SECS="${STALL_SECS:-1500}"
PROBE_TIMEOUT="${PROBE_TIMEOUT:-300}"
MAX_RELAUNCHES="${MAX_RELAUNCHES:-50}"

probe() {
  timeout "$PROBE_TIMEOUT" python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe ok:", float(jnp.sum(x @ x)), jax.default_backend())
EOF
}

relaunches=0
while [ "$relaunches" -lt "$MAX_RELAUNCHES" ]; do
  until probe >> "$LOG" 2>&1; do
    echo "[stall_guard] TPU probe failed; retrying in 300s" >> "$LOG"
    sleep 300
  done
  echo "[stall_guard] launching: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALL_SECS" ]; then
      echo "[stall_guard] log quiet $((now - mt))s; killing pid $PID" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[stall_guard] job finished rc=0" >> "$LOG"
    exit 0
  fi
  relaunches=$((relaunches + 1))
  echo "[stall_guard] job exited rc=$rc; relaunch #$relaunches" >> "$LOG"
  sleep 30
done
echo "[stall_guard] gave up after $MAX_RELAUNCHES relaunches" >> "$LOG"
exit 1
