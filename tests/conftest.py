"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session, mirroring
how multi-chip sharding is validated without TPU hardware.
"""
import os

# Force CPU: the ambient environment may preset JAX_PLATFORMS to a TPU plugin
# (e.g. axon); the test suite must run on the virtual 8-device CPU mesh.
# ROBUSTBNNS_TEST_BACKEND=tpu opts out for hardware-validation runs of the
# TPU-only tests (e.g. kernel PRNG seed sensitivity, skipped on CPU).
_force_cpu = os.environ.get("ROBUSTBNNS_TEST_BACKEND", "cpu") != "tpu"
if _force_cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
# Offline-safe data: substitute deterministic surrogates for download-only sets.
os.environ.setdefault("ROBUSTBNNS_DATA_FALLBACK", "synthetic")

import jax  # noqa: E402

# A site hook may have force-registered a TPU plugin and overridden
# jax_platforms at import time (jax.config wins over the env var) — re-assert
# CPU after import so the suite never silently runs over a TPU tunnel.
if _force_cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
