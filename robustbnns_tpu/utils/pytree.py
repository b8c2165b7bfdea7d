"""Pytree helpers.

The reference materializes posterior samples as N ``deepcopy``'d torch modules
(reference ``model_bnn.py:279-294``); here the equivalent object is a *stacked
pytree* — every leaf gains a leading sample axis — which vmaps straight onto the
TPU and stores one contiguous buffer per parameter instead of N module copies.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = Any  # pytree of jnp arrays


def tree_size(tree: Params) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def normal_like_tree(key: jax.Array, tree: Params, dtype=None) -> Params:
    """Draw iid standard-normal leaves shaped like ``tree``.

    Used for the guide's random init (reference ``model_bnn.py:125-126`` inits
    ``loc``/``scale`` with ``torch.randn_like``) and for reparameterized weight
    draws.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    new_leaves = [
        jax.random.normal(k, x.shape, dtype or x.dtype) for k, x in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def stack_trees(trees: list[Params]) -> Params:
    """Stack a list of identically-structured pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def index_tree(tree: Params, idx) -> Params:
    """Index every leaf's leading axis (select sample(s) from a stacked pytree)."""
    return jax.tree_util.tree_map(lambda x: x[idx], tree)


def slice_tree(tree: Params, n: int) -> Params:
    """Take the first ``n`` entries along every leaf's leading axis."""
    return jax.tree_util.tree_map(lambda x: x[:n], tree)


def flatten_tree_to_vector(tree: Params):
    """Flatten a pytree to a single 1-D vector plus an unravel function.

    HMC integrates momenta in this flat space (one fused vector op per leapfrog
    half-step rather than a tree_map over many small leaves).
    """
    return jax.flatten_util.ravel_pytree(tree)


def tree_map_with_path_names(fn: Callable[[str, jax.Array], Any], tree: Params):
    """Map ``fn(name, leaf)`` over a pytree with '/'-joined string paths."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = [fn(_path_str(path), leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, out)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)
