"""Checkpointing: pytrees ↔ ``.npz`` files keyed by flattened paths.

The reference's artifact identity is the name-mangled config string — "the
filename *is* the config hash" (reference ``model_bnn.py:90-103``,
``model_nn.py:143-163``). We keep that scheme: callers pass a directory +
filename derived from the config's ``name``. The on-disk format is a single
compressed ``.npz`` holding every leaf under its '/'-joined tree path — one file
per model even for stacked HMC posteriors (vs the reference's one ``.pt`` per
posterior sample, ``model_bnn.py:157-162``).

Backend selection (SURVEY §5.4's "Orbax-style checkpoints" note): npz is the
default — these models are ≤ tens of MB and a single compressed file is the
most portable artifact. ``ROBUSTBNNS_CKPT_BACKEND=orbax`` (or
``backend="orbax"``) switches saves to Orbax's async checkpointer instead —
the save returns after staging device arrays to host and the serialization
overlaps subsequent compute, which matters for very large stacked posteriors
(e.g. many-sample HMC over wide models) and for sharded arrays on multi-chip
meshes, where Orbax writes per-shard without gathering to one host. Loading
auto-detects the on-disk format, so the two backends interoperate.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

_META_KEY = "__robustbnns_meta__"
_ORBAX_SUFFIX = ".orbax"
_async_checkpointer = None  # lazy singleton; owns the background write threads


def _backend(backend: Optional[str]) -> str:
    backend = backend or os.environ.get("ROBUSTBNNS_CKPT_BACKEND", "npz")
    if backend not in ("npz", "orbax"):
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    return backend


def _surrogate_meta() -> dict:
    """Tag saves from a process that served synthetic surrogate data, so a
    later load against a different surrogate generation warns instead of
    silently scoring ~chance (see ``data.datasets.SURROGATE_VERSION``)."""
    from robustbnns_tpu.data.datasets import surrogate_fingerprint

    return surrogate_fingerprint() or {}


def _warn_surrogate_mismatch(path: str) -> None:
    from robustbnns_tpu.data.datasets import SURROGATE_VERSION

    try:
        meta = load_meta(path)
    except Exception:
        return
    v = meta.get("surrogate_version")
    if v is not None and v != SURROGATE_VERSION:
        import warnings

        warnings.warn(
            f"checkpoint {path} was trained on synthetic-surrogate data "
            f"version {v}, but this process generates version "
            f"{SURROGATE_VERSION} — the distributions differ, so evaluating "
            "this model on the current surrogate will score ~chance. Retrain, "
            "or check out the matching code version.",
            stacklevel=3,
        )


def save_pytree(
    tree: Any, path: str, meta: Optional[dict] = None, backend: Optional[str] = None
) -> str:
    """Save a pytree of arrays to ``path`` (``.npz`` appended if missing).

    Saves from a process that served synthetic surrogate data are tagged with
    the surrogate generator version (see :func:`_surrogate_meta`).
    """
    meta = {**_surrogate_meta(), **(meta or {})}
    if _backend(backend) == "orbax":
        return _save_pytree_orbax(tree, path, meta)
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {}
    for key_path, leaf in flat:
        name = _path_to_str(key_path)
        arrays[name] = np.asarray(leaf)
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)
    return path


def _orbax_dir(path: str) -> str:
    if path.endswith(".npz"):
        path = path[: -len(".npz")]
    if path.endswith(_ORBAX_SUFFIX):  # accept the path save_pytree returned
        return os.path.abspath(path)
    return os.path.abspath(path + _ORBAX_SUFFIX)


def _get_async_checkpointer():
    global _async_checkpointer
    if _async_checkpointer is None:
        import orbax.checkpoint as ocp

        _async_checkpointer = ocp.AsyncCheckpointer(
            ocp.CompositeCheckpointHandler()
        )
    return _async_checkpointer


def _save_pytree_orbax(tree: Any, path: str, meta: Optional[dict]) -> str:
    """Async Orbax save: returns after staging; serialization runs in background.

    Orbax manages atomicity itself (tmp dir + rename), so an interrupted save
    never leaves a readable-but-corrupt checkpoint. The meta dict rides in the
    SAME composite checkpoint (a ``meta`` item next to ``state``), so metadata
    and arrays commit atomically — a crashed save leaves neither. Device
    arrays are passed through as-is: Orbax serializes ``jax.Array`` natively,
    including sharded arrays on a multi-chip mesh (per-shard writes, no
    gather-to-one-host).
    """
    d = _orbax_dir(path)
    os.makedirs(os.path.dirname(d), exist_ok=True)
    ckptr = _get_async_checkpointer()
    args = _orbax_args()
    ckptr.save(
        d,
        args=args.Composite(
            state=args.StandardSave(tree), meta=args.JsonSave(meta or {})
        ),
        force=True,
    )
    return d


def _orbax_args():
    import orbax.checkpoint as ocp

    return ocp.args


def wait_for_checkpoints() -> None:
    """Block until all in-flight async (orbax) saves are durable on disk."""
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def load_pytree(template: Any, path: str) -> Any:
    """Load arrays saved by :func:`save_pytree` into the structure of ``template``.

    ``template`` supplies the treedef (and validates shapes); leaves are replaced
    by the stored arrays. The on-disk format (npz vs orbax directory) is
    auto-detected, so checkpoints written under either backend load the same.
    Warns when the checkpoint's synthetic-surrogate version differs from this
    process's generator (stale checkpoints would silently score ~chance).
    """
    _warn_surrogate_mismatch(path)
    if not os.path.exists(path if path.endswith(".npz") else path + ".npz"):
        # No npz — the checkpoint may be an orbax directory, possibly with its
        # async save still in flight (the final dir only appears on rename).
        wait_for_checkpoints()
        d = _orbax_dir(path)
        if os.path.isdir(d):
            return _load_pytree_orbax(template, d)
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as data:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for key_path, leaf in flat:
            name = _path_to_str(key_path)
            if name not in data:
                raise KeyError(f"checkpoint {path} is missing leaf {name!r}")
            arr = data[name]
            if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"checkpoint leaf {name!r} has shape {arr.shape}, "
                    f"expected {tuple(leaf.shape)}"
                )
            leaves.append(arr)
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(treedef, [jnp.asarray(x) for x in leaves])


def _load_pytree_orbax(template: Any, d: str) -> Any:
    import jax.numpy as jnp

    ckptr = _get_async_checkpointer()
    ckptr.wait_until_finished()  # the save may still be in flight
    args = _orbax_args()
    try:
        restored = ckptr.restore(
            d, args=args.Composite(state=args.StandardRestore(template))
        )["state"]
    except Exception:
        # Legacy (pre round-3) layout: a bare StandardCheckpointHandler dir.
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as legacy:
            host_template = jax.tree_util.tree_map(np.asarray, template)
            restored = legacy.restore(d, args=args.StandardRestore(host_template))
    # Template leaves that are (possibly sharded) jax.Arrays restore with
    # their shardings preserved — only lift host arrays back to device.
    return jax.tree_util.tree_map(
        lambda a: a if isinstance(a, jax.Array) else jnp.asarray(a), restored
    )


def load_meta(path: str) -> dict:
    if not os.path.exists(path if path.endswith(".npz") else path + ".npz"):
        wait_for_checkpoints()
        d = _orbax_dir(path)
        if os.path.isdir(d):
            args = _orbax_args()
            ckptr = _get_async_checkpointer()
            try:
                return ckptr.restore(
                    d, args=args.Composite(meta=args.JsonRestore())
                )["meta"] or {}
            except Exception:
                pass  # legacy (pre round-3) dir without a "meta" item — try sidecar
        meta_path = d + ".meta.json"  # legacy sidecar (pre round-3 format)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                return json.load(f)
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as data:
        if _META_KEY not in data:
            return {}
        return json.loads(bytes(data[_META_KEY]).decode("utf-8"))


def _path_to_str(key_path) -> str:
    parts = []
    for p in key_path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts) if parts else "__root__"
