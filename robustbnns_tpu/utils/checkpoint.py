"""Checkpointing: pytrees ↔ ``.npz`` files keyed by flattened paths.

The reference's artifact identity is the name-mangled config string — "the
filename *is* the config hash" (reference ``model_bnn.py:90-103``,
``model_nn.py:143-163``). We keep that scheme: callers pass a directory +
filename derived from the config's ``name``. The on-disk format is a single
compressed ``.npz`` holding every leaf under its '/'-joined tree path — one file
per model even for stacked HMC posteriors (vs the reference's one ``.pt`` per
posterior sample, ``model_bnn.py:157-162``).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

_META_KEY = "__robustbnns_meta__"


def save_pytree(tree: Any, path: str, meta: Optional[dict] = None) -> str:
    """Save a pytree of arrays to ``path`` (``.npz`` appended if missing)."""
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


def load_pytree(template: Any, path: str) -> Any:
    """Load arrays saved by :func:`save_pytree` into the structure of ``template``.

    ``template`` supplies the treedef (and validates shapes); leaves are replaced
    by the stored arrays.
    """
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


def load_meta(path: str) -> dict:
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
