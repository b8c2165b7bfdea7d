"""Multi-host initialization and work partitioning.

The reference's only multi-worker story is a joblib process pool with disk as
the sole channel (``grid_search_halfMoons.py:52-60``). The TPU-native
equivalent has two tiers:

* **within a slice**: ``jax.distributed.initialize`` connects the per-host
  processes of a pod slice into one JAX runtime, after which every mesh in
  :mod:`robustbnns_tpu.parallel.mesh` can span all hosts' devices and XLA
  collectives ride ICI/DCN transparently (SURVEY §5.8);
* **across independent workers** (grid cells, embarrassingly parallel):
  deterministic round-robin partitioning by host id
  (``grid_cells_for_host``) with checkpoints-on-disk as the only
  coordination — the same recovery model as the reference's workers, minus
  joblib.

Host identity resolves from (in order): explicit arguments, the live JAX
distributed runtime, or the ``ROBUSTBNNS_HOST_ID`` / ``ROBUSTBNNS_N_HOSTS``
environment variables — the env path lets plain OS processes (e.g. two CPU
processes on one box, or a SLURM array) fan a grid out with zero runtime
coupling, exactly like the reference's joblib workers.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Connect this process to a multi-host JAX runtime.

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) that ``jax.distributed`` itself
    honors; on TPU pods all three auto-detect from the metadata server, so
    ``initialize_distributed()`` with no arguments is correct there too.

    Returns True when a multi-process runtime was initialized; False for the
    single-process no-op (num_processes absent or 1), so single-host scripts
    can call this unconditionally.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process: nothing to connect

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_identity(
    host_id: Optional[int] = None, n_hosts: Optional[int] = None
) -> tuple[int, int]:
    """This worker's ``(host_id, n_hosts)`` for work partitioning.

    Resolution order: explicit args → live JAX distributed runtime
    (``jax.process_index/count``) → ``ROBUSTBNNS_HOST_ID``/``ROBUSTBNNS_N_HOSTS``
    env vars → ``(0, 1)``.
    """
    if host_id is not None and n_hosts is not None:
        return host_id, n_hosts
    if (host_id is None) != (n_hosts is None):
        # A lone --host_id (or --n_hosts) silently resolving to (0, 1) would
        # make this worker train the ENTIRE grid and race its peers on the
        # shared checkpoints — refuse instead.
        raise ValueError(
            "host_id and n_hosts must be given together "
            f"(got host_id={host_id}, n_hosts={n_hosts})"
        )

    import jax

    if jax.process_count() > 1:
        return jax.process_index(), jax.process_count()

    env_id = os.environ.get("ROBUSTBNNS_HOST_ID")
    env_n = os.environ.get("ROBUSTBNNS_N_HOSTS")
    if env_id is not None and env_n is not None:
        return int(env_id), int(env_n)
    return 0, 1


def partition_for_host(
    items: Sequence,
    host_id: Optional[int] = None,
    n_hosts: Optional[int] = None,
) -> list:
    """This host's share of an embarrassingly-parallel work list.

    Deterministic round-robin: every item lands on exactly one host, any
    subset of hosts can crash and be re-run, and re-partitioning with the
    same ``n_hosts`` is stable (checkpoint resume stays valid).
    """
    hid, n = host_identity(host_id, n_hosts)
    if not 0 <= hid < n:
        raise ValueError(f"host_id {hid} out of range for {n} hosts")
    return [item for i, item in enumerate(items) if i % n == hid]
