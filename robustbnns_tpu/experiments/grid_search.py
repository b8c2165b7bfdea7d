"""Half Moons grid search (reference ``grid_search_halfMoons.py``).

The reference fans grid cells out over 10 joblib CPU processes
(``:52-60``) — the only parallelism in that codebase. Here each cell runs as
compiled TPU programs (HMC chains themselves can be chain-parallel via
``num_chains``), cells sharing shapes reuse their compiled executables, and the
cell loop is restartable because every artifact is keyed by the reference's
name-mangled config string. Multi-host fan-out shards the cell list by host id
(``grid_cells_for_host``) — disk is the only coordination, exactly like the
reference's joblib workers.

``MoonsBNN`` parity: dataset ``half_moons``, HMC ``step_size=0.001`` override
(``grid_search_halfMoons.py:18-24``), name includes ``n_inputs``; batch size 64
for SVI / 1024 for HMC (``:33``).
"""
from __future__ import annotations

import itertools
from typing import Iterable, Sequence

from robustbnns_tpu.config import BNNConfig, TESTS


def moons_config(
    hidden_size, activation, architecture, inference, epochs, lr, n_samples, warmup
) -> BNNConfig:
    """A Half-Moons BNN config (reference ``MoonsBNN``, ``:18-24``)."""
    return BNNConfig(
        dataset="half_moons",
        hidden_size=hidden_size,
        activation=activation,
        architecture=architecture,
        inference=inference,
        epochs=epochs,
        lr=lr,
        n_samples=n_samples,
        warmup=warmup,
        step_size=0.001,
    )


def grid_combinations(
    hidden_size, activation, architecture, inference, epochs, lr,
    n_samples, warmup, n_inputs,
) -> list[tuple]:
    """Cartesian product in the reference's axis order (``:46-47``)."""
    return list(
        itertools.product(
            hidden_size, activation, architecture, inference, epochs, lr,
            n_samples, warmup, n_inputs,
        )
    )


def grid_cells_for_host(
    cells: Sequence, host_id: int | None = None, n_hosts: int | None = None
) -> list:
    """This host's grid cells (round-robin; see ``parallel.partition_for_host``).

    With no arguments the host identity auto-resolves from the JAX distributed
    runtime or the ``ROBUSTBNNS_HOST_ID``/``ROBUSTBNNS_N_HOSTS`` env vars — so
    N independent OS processes each running the same grid command split the
    work with disk as the only channel (the reference's joblib model,
    ``grid_search_halfMoons.py:52-60``, without joblib).
    """
    from robustbnns_tpu.parallel.distributed import partition_for_host

    return partition_for_host(cells, host_id, n_hosts)


def moons_batch_size(inference: str) -> int:
    return 64 if inference == "svi" else 1024  # reference :33


def grid_train(
    cells: Iterable[tuple],
    rel_path: str = TESTS,
    *,
    num_chains: int = 1,
    hmc_mode: str = "faithful",
    sampler: str = "hmc",
    save: bool = True,
    resume: bool = True,
    verbose: bool = True,
):
    """Train + save every grid cell (reference ``_train``/``serial_train``, ``:30-50``).

    ``resume=True`` (the failure-recovery model: checkpoints-on-disk keyed by
    the config name, like the reference's joblib workers — SURVEY §5.3) skips
    cells whose checkpoint already exists, so a crashed/preempted sweep
    restarts where it stopped.

    ``sampler='nuts'`` swaps the fixed-trajectory HMC kernel for NUTS
    (beyond-reference: the principled engine for these posteriors — see
    :mod:`robustbnns_tpu.inference.nuts`); use a distinct ``rel_path`` so
    variants don't collide on the name-keyed checkpoints. ``save=False``
    trains without persisting (e.g. timing-only reruns).
    """
    import os

    from robustbnns_tpu.data import load_dataset
    from robustbnns_tpu.models import BNN

    trained = []
    for cell in cells:
        *cfg_args, n_inputs = cell
        cfg = moons_config(*cfg_args)
        x_train, y_train, _, _, inp_shape, out_size = load_dataset(
            "half_moons", n_inputs=n_inputs, shuffle=False
        )
        bnn = BNN.from_config(cfg, inp_shape, out_size, n_inputs=n_inputs)
        ckpt = os.path.join(rel_path, bnn.name, bnn.name + "_weights.npz")
        if resume and os.path.exists(ckpt):
            if verbose:
                print(f"\n=== grid cell (resumed from checkpoint): {bnn.name}")
            trained.append(bnn.load(rel_path=rel_path))
            continue
        if verbose:
            print(f"\n=== grid cell: {bnn.name}")
        bnn.train(
            x_train, y_train,
            batch_size=moons_batch_size(cfg.inference),
            num_chains=num_chains,
            hmc_mode=hmc_mode,
            hmc_sampler=sampler,
            verbose=verbose,
        )
        if save:
            bnn.save(rel_path=rel_path)
        trained.append(bnn)
    return trained


def grid_compute_grads(
    cells: Iterable[tuple],
    posterior_samples_list: Sequence[int],
    test_points: int,
    rel_path: str = TESTS,
    verbose: bool = True,
):
    """Expected gradients per (cell, posterior_samples)
    (reference ``_compute_grads``, ``:66-99``)."""
    from robustbnns_tpu.analysis import loss_gradients
    from robustbnns_tpu.data import load_dataset
    from robustbnns_tpu.models import BNN

    _, _, x_test, y_test, inp_shape, out_size = load_dataset(
        "half_moons", n_inputs=test_points, shuffle=True
    )
    for cell in cells:
        *cfg_args, n_inputs = cell
        cfg = moons_config(*cfg_args)
        bnn = BNN.from_config(cfg, inp_shape, out_size, n_inputs=n_inputs).load(
            rel_path=rel_path
        )
        for p_samp in posterior_samples_list:
            loss_gradients(
                bnn, x_test, y_test, n_samples=p_samp,
                filename=bnn.name, savedir=bnn.name, rel_path=rel_path,
                verbose=verbose,
            )


def grid_attack(
    cells: Iterable[tuple],
    posterior_samples_list: Sequence[int],
    test_points: int,
    method: str = "fgsm",
    rel_path: str = TESTS,
    verbose: bool = True,
):
    """Attack per (cell, posterior_samples) (reference ``grid_attack``, ``:133-153``)."""
    from robustbnns_tpu.attacks import attack
    from robustbnns_tpu.data import load_dataset
    from robustbnns_tpu.models import BNN

    _, _, x_test, y_test, inp_shape, out_size = load_dataset(
        "half_moons", n_inputs=test_points
    )
    for cell in cells:
        *cfg_args, n_inputs = cell
        cfg = moons_config(*cfg_args)
        bnn = BNN.from_config(cfg, inp_shape, out_size, n_inputs=n_inputs).load(
            rel_path=rel_path
        )
        for p_samp in posterior_samples_list:
            attack(
                bnn, x_test, y_test, method=method, n_samples=p_samp,
                filename=bnn.name, rel_path=rel_path, verbose=verbose,
            )
