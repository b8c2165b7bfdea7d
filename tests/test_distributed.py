"""Multi-host partitioning + the 2-process grid fan-out demo.

The real multi-host path is ``jax.distributed.initialize`` on a pod (see
``parallel/distributed.py``); what is testable on one box is the contract the
fan-out relies on: exact-once round-robin partitioning, env-based host
identity, and two independent OS processes covering a grid with disk as the
only channel (the reference's joblib model, ``grid_search_halfMoons.py:52-60``).
"""
import os
import subprocess
import sys

import pytest

from robustbnns_tpu.experiments.grid_search import (
    grid_cells_for_host,
    grid_combinations,
    moons_config,
)
from robustbnns_tpu.parallel import host_identity, initialize_distributed, partition_for_host


def test_partition_covers_all_items_exactly_once():
    items = list(range(37))
    for n_hosts in (1, 2, 3, 8):
        shares = [partition_for_host(items, h, n_hosts) for h in range(n_hosts)]
        combined = sorted(i for share in shares for i in share)
        assert combined == items


def test_partition_rejects_bad_host_id():
    with pytest.raises(ValueError):
        partition_for_host([1, 2, 3], host_id=2, n_hosts=2)


def test_host_identity_resolution_order(monkeypatch):
    assert host_identity(3, 5) == (3, 5)
    monkeypatch.setenv("ROBUSTBNNS_HOST_ID", "1")
    monkeypatch.setenv("ROBUSTBNNS_N_HOSTS", "4")
    assert host_identity() == (1, 4)
    monkeypatch.delenv("ROBUSTBNNS_HOST_ID")
    monkeypatch.delenv("ROBUSTBNNS_N_HOSTS")
    assert host_identity() == (0, 1)


def test_initialize_distributed_single_process_noop():
    assert initialize_distributed() is False


_WORKER = """
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("ROBUSTBNNS_DATA_FALLBACK", "synthetic")
sys.path.insert(0, {repo!r})
from robustbnns_tpu.experiments.grid_search import (
    grid_cells_for_host, grid_combinations, grid_train,
)
cells = grid_cells_for_host(grid_combinations(
    hidden_size=[16, 32], activation=["leaky"], architecture=["fc"],
    inference=["hmc"], epochs=[None], lr=[None],
    n_samples=[4], warmup=[4], n_inputs=[128],
))  # host identity comes from ROBUSTBNNS_HOST_ID / ROBUSTBNNS_N_HOSTS
print("CELLS", len(cells))
grid_train(cells, rel_path={rel_path!r}, verbose=False)
"""


def test_two_process_grid_fanout(tmp_path):
    """Two OS processes, each told only its host id, cover the whole grid."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rel_path = str(tmp_path) + os.sep
    script = _WORKER.format(repo=repo, rel_path=rel_path)

    for host_id in (0, 1):
        env = dict(os.environ)
        env.update(
            ROBUSTBNNS_HOST_ID=str(host_id),
            ROBUSTBNNS_N_HOSTS="2",
            ROBUSTBNNS_DATA_FALLBACK="synthetic",
        )
        proc = subprocess.run(
            [sys.executable, "-c", script],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr
        assert "CELLS 1" in proc.stdout  # 2 cells round-robin over 2 hosts

    # Every cell's checkpoint exists exactly where the resume logic looks.
    cells = grid_combinations(
        hidden_size=[16, 32], activation=["leaky"], architecture=["fc"],
        inference=["hmc"], epochs=[None], lr=[None],
        n_samples=[4], warmup=[4], n_inputs=[128],
    )
    for cell in cells:
        *cfg_args, n_inputs = cell
        name = moons_config(*cfg_args).name(n_inputs)
        ckpt = tmp_path / name / (name + "_weights.npz")
        assert ckpt.exists(), f"missing checkpoint for cell {name}"


_CLUSTER_WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from robustbnns_tpu.parallel.distributed import (
    host_identity, initialize_distributed, partition_for_host,
)
ok = initialize_distributed(
    coordinator_address="localhost:{port}", num_processes=2,
    process_id={pid},
)
assert ok, "expected a multi-process runtime"
assert jax.process_count() == 2
hid, n = host_identity()  # resolves from the LIVE runtime, no env vars
assert (hid, n) == ({pid}, 2), (hid, n)
mine = partition_for_host(list(range(7)))
print("MINE", mine)
import jax.numpy as jnp
from jax.experimental import multihost_utils
gathered = multihost_utils.process_allgather(jnp.asarray([float({pid})]))
print("GATHERED", gathered.ravel().tolist())
"""


def test_two_process_jax_distributed_cluster():
    """A REAL jax.distributed runtime across two OS processes: host identity
    resolves from the runtime (no env vars), partitioning covers the work
    list exactly once, and a cross-process collective round-trips."""
    import re
    import socket

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Ephemeral free port (a fixed port flakes when a stale worker holds it).
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("ROBUSTBNNS_HOST_ID", None)
        env.pop("ROBUSTBNNS_N_HOSTS", None)
        script = _CLUSTER_WORKER.format(repo=repo, port=port, pid=pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err
        outs.append(out)
    mines = [eval(re.search(r"MINE (\[.*?\])", o).group(1)) for o in outs]
    assert sorted(mines[0] + mines[1]) == list(range(7))
    for o in outs:
        assert "GATHERED [0.0, 1.0]" in o
