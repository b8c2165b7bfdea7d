"""Checkpoint backends: npz default and the Orbax async alternative.

The npz format is exercised indirectly by every model save/load test; these
cover the backend seam itself (SURVEY §5.4): explicit backend choice, env-var
selection, format auto-detection on load, meta round-trips, and async-save
durability via ``wait_for_checkpoints``.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.utils.checkpoint import (
    load_meta,
    load_pytree,
    save_pytree,
    wait_for_checkpoints,
)


@pytest.fixture
def tree():
    return {
        "w": jnp.arange(12.0).reshape(3, 4),
        "nested": {"b": jnp.ones((5,)), "n": jnp.full((2, 2), 7.0)},
    }


def _assert_tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_npz_roundtrip_with_meta(tree, tmp_path):
    path = save_pytree(tree, str(tmp_path / "ckpt"), meta={"epochs": 5})
    assert path.endswith(".npz")
    _assert_tree_equal(load_pytree(tree, str(tmp_path / "ckpt")), tree)
    assert load_meta(str(tmp_path / "ckpt")) == {"epochs": 5}


def test_orbax_roundtrip_with_meta(tree, tmp_path):
    path = save_pytree(
        tree, str(tmp_path / "ckpt"), meta={"lr": 0.01}, backend="orbax"
    )
    assert path.endswith(".orbax")
    wait_for_checkpoints()
    assert os.path.isdir(path)
    # load_pytree auto-detects the orbax directory from the same logical path
    _assert_tree_equal(load_pytree(tree, str(tmp_path / "ckpt")), tree)
    assert load_meta(str(tmp_path / "ckpt")) == {"lr": 0.01}


def test_orbax_load_accepts_returned_path(tree, tmp_path):
    """load_pytree/load_meta must accept the exact path save_pytree returned
    (which carries the .orbax suffix), not just the logical path."""
    path = save_pytree(tree, str(tmp_path / "rp"), meta={"a": 1}, backend="orbax")
    wait_for_checkpoints()
    _assert_tree_equal(load_pytree(tree, path), tree)
    assert load_meta(path)["a"] == 1


def test_orbax_backend_via_env(tree, tmp_path, monkeypatch):
    monkeypatch.setenv("ROBUSTBNNS_CKPT_BACKEND", "orbax")
    path = save_pytree(tree, str(tmp_path / "envckpt"))
    assert path.endswith(".orbax")
    monkeypatch.delenv("ROBUSTBNNS_CKPT_BACKEND")
    _assert_tree_equal(load_pytree(tree, str(tmp_path / "envckpt")), tree)


def test_unknown_backend_rejected(tree, tmp_path):
    with pytest.raises(ValueError, match="unknown checkpoint backend"):
        save_pytree(tree, str(tmp_path / "x"), backend="pickle")


def test_surrogate_version_tagged_and_mismatch_warns(tree, tmp_path, monkeypatch):
    """Checkpoints saved from a process that served synthetic surrogate data
    carry the generator version; loading under a different generator warns
    instead of silently scoring ~chance (ADVICE r2 #4)."""
    from robustbnns_tpu.data import datasets

    monkeypatch.setattr(datasets, "_surrogate_served", {"mnist"})
    save_pytree(tree, str(tmp_path / "surr"), meta={"epochs": 1})
    meta = load_meta(str(tmp_path / "surr"))
    assert meta["surrogate_version"] == datasets.SURROGATE_VERSION
    assert meta["surrogate_datasets"] == ["mnist"]
    assert meta["epochs"] == 1

    # Same generator: silent.
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        load_pytree(tree, str(tmp_path / "surr"))
    # Different generator version: loud.
    monkeypatch.setattr(datasets, "SURROGATE_VERSION", 99)
    with pytest.warns(UserWarning, match="surrogate"):
        load_pytree(tree, str(tmp_path / "surr"))


def test_no_surrogate_tag_without_synthetic_data(tree, tmp_path, monkeypatch):
    from robustbnns_tpu.data import datasets

    monkeypatch.setattr(datasets, "_surrogate_served", set())
    save_pytree(tree, str(tmp_path / "real"))
    assert "surrogate_version" not in load_meta(str(tmp_path / "real"))


def test_legacy_orbax_meta_sidecar(tree, tmp_path):
    """A pre-round-3 orbax checkpoint (bare StandardCheckpointHandler dir +
    ``.meta.json`` sidecar) has no "meta" Composite item; load_meta must fall
    back to the sidecar instead of raising (ADVICE r3 #1)."""
    import json

    import orbax.checkpoint as ocp

    d = str(tmp_path / "legacy.orbax")
    host_tree = jax.tree_util.tree_map(np.asarray, tree)
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        ckptr.save(d, args=ocp.args.StandardSave(host_tree))
    with open(d + ".meta.json", "w") as f:
        json.dump({"epochs": 3}, f)
    assert load_meta(str(tmp_path / "legacy")) == {"epochs": 3}
    _assert_tree_equal(load_pytree(tree, str(tmp_path / "legacy")), tree)


def test_npz_takes_precedence_when_both_exist(tree, tmp_path):
    """If an npz and an orbax dir share a logical path, npz (the default
    format) wins on load — saves under the default backend stay canonical."""
    other = jax.tree_util.tree_map(lambda x: x * 2, tree)
    save_pytree(other, str(tmp_path / "both"), backend="orbax")
    wait_for_checkpoints()
    save_pytree(tree, str(tmp_path / "both"))
    _assert_tree_equal(load_pytree(tree, str(tmp_path / "both")), tree)
