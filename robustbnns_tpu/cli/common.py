"""Shared CLI plumbing: flag parsing, device selection, data loading."""
from __future__ import annotations

import argparse


def boolean(value: str) -> bool:
    """Parse the reference's ``type=eval`` booleans (``model_bnn.py:433-434``)
    without the arbitrary-code-execution footgun."""
    v = str(value).strip().lower()
    if v in ("true", "1", "yes"):
        return True
    if v in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected True/False, got {value!r}")


def setup_device(device: str, mesh: str | None = None) -> None:
    """Map the reference's ``--device cpu|cuda`` to JAX platform selection.

    ``cpu`` pins the CPU backend; ``cuda``/``tpu``/``auto`` use the default
    (the TPU when a plugin is registered). Must run before the first jax op.

    ``mesh`` (or env ``ROBUSTBNNS_MESH``) installs a process-default device
    mesh so every mesh-aware API in the process runs SPMD over it:
    ``"4x2"`` = (data=4, sample=2), ``"8"`` = (data=8, sample=1),
    ``"auto"`` = all devices on the data axis.
    """
    import os

    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # anything else: leave the default backend (TPU under axon).

    spec = mesh if mesh is not None else os.environ.get("ROBUSTBNNS_MESH")
    if spec:
        from robustbnns_tpu.parallel import make_mesh, set_default_mesh

        if spec == "auto":
            m = make_mesh()
        elif "x" in spec:
            n_data, n_sample = (int(s) for s in spec.split("x"))
            m = make_mesh(n_data=n_data, n_sample=n_sample)
        else:
            m = make_mesh(n_data=int(spec), n_sample=1)
        set_default_mesh(m)
        print(
            f"[mesh] default mesh installed: "
            f"{dict(zip(m.axis_names, m.devices.shape))}"
        )


def add_common_flags(parser: argparse.ArgumentParser, n_inputs_default=60000):
    parser.add_argument(
        "--n_inputs", default=n_inputs_default, type=int, help="number of input points"
    )
    parser.add_argument(
        "--model_idx", default=0, type=int, help="choose idx from the model zoo"
    )
    parser.add_argument(
        "--train", default=True, type=boolean, help="train or load saved model"
    )
    parser.add_argument(
        "--test", default=True, type=boolean, help="evaluate on test data"
    )
    parser.add_argument(
        "--savedir", default="DATA", type=str, help="DATA, TESTS"
    )
    parser.add_argument(
        "--device", default="tpu", type=str, help="cpu, cuda, tpu"
    )
    parser.add_argument(
        "--mesh",
        default=None,
        type=str,
        help="default device mesh, e.g. 4x2 (data x sample), 8, or auto",
    )
    return parser


def load_data(dataset: str, n_inputs, shuffle=True):
    """Reference ``data_loaders`` equivalent returning arrays + shape info.

    Tries the real dataset first; on a machine with no local copy and no
    network it falls back to the deterministic synthetic surrogate with a loud
    warning (half moons is always real — generated locally).
    """
    from robustbnns_tpu.data import load_dataset

    try:
        return load_dataset(dataset, n_inputs=n_inputs, shuffle=shuffle)
    except FileNotFoundError:
        print(
            f"WARNING: no local copy of {dataset!r} and no network — using the "
            "deterministic SYNTHETIC surrogate (identical shapes/ranges). "
            "Accuracy numbers are not comparable to the real dataset."
        )
        return load_dataset(
            dataset, n_inputs=n_inputs, shuffle=shuffle, fallback="synthetic"
        )
