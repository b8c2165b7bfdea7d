"""Data-layer parity tests (reference utils.py:25-235)."""
import numpy as np
import pytest

from robustbnns_tpu.data import (
    Batches,
    batch_arrays,
    classwise_arrays,
    labels_to_onehot,
    load_dataset,
    load_half_moons,
    onehot_to_labels,
)


def test_half_moons_shapes_and_normalization():
    x_train, y_train, x_test, y_test, input_shape, num_classes = load_half_moons()
    assert x_train.shape == (24000, 1, 2, 1)
    assert x_test.shape == (6000, 1, 2, 1)
    assert y_train.shape == (24000, 2) and y_test.shape == (6000, 2)
    assert input_shape == (1, 2, 1)
    assert num_classes == 2
    allx = np.concatenate([x_train, x_test])
    assert allx.min() == pytest.approx(0.0) and allx.max() == pytest.approx(1.0)
    # one-hot labels
    assert np.all(y_train.sum(-1) == 1.0)


def test_half_moons_matches_reference_generation():
    """Byte-level parity with the reference generation (utils.py:67-92)."""
    from sklearn.datasets import make_moons

    x, y = make_moons(n_samples=30000, shuffle=True, noise=0.1, random_state=0)
    x = x.astype("float32")
    x = (x - np.min(x)) / (np.max(x) - np.min(x))
    x_train_ref = x[:24000].reshape(24000, 1, 2, 1)

    x_train, *_ = load_half_moons()
    np.testing.assert_array_equal(x_train, x_train_ref)


def test_load_dataset_truncation_and_shuffle():
    x_train, y_train, x_test, y_test, *_ = load_dataset(
        "half_moons", n_inputs=100, shuffle=True
    )
    assert len(x_train) == 100 and len(x_test) == 100
    # deterministic shuffle
    x2, *_ = load_dataset("half_moons", n_inputs=100, shuffle=True)
    np.testing.assert_array_equal(x_train, x2)


def test_synthetic_mnist_fallback():
    x_train, y_train, x_test, y_test, input_shape, n_classes = load_dataset(
        "mnist", n_inputs=256, fallback="synthetic"
    )
    assert x_train.shape == (256, 28, 28, 1)
    assert input_shape == (28, 28, 1)
    assert n_classes == 10
    assert 0.0 <= x_train.min() and x_train.max() <= 1.0
    # deterministic
    x2, *_ = load_dataset("mnist", n_inputs=256, fallback="synthetic")
    np.testing.assert_array_equal(x_train, x2)


def test_synthetic_cifar_fallback():
    x_train, *_rest = load_dataset("cifar", n_inputs=64, fallback="synthetic")
    assert x_train.shape == (64, 32, 32, 3)


def test_onehot_roundtrip():
    labels = np.array([0, 3, 9, 1])
    oh = labels_to_onehot(labels, 10)
    assert oh.shape == (4, 10)
    np.testing.assert_array_equal(onehot_to_labels(oh), labels)


def test_batch_arrays_masks_ragged_tail():
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    y = labels_to_onehot(np.zeros(10, dtype=np.int64), 2)
    eb = batch_arrays(x, y, batch_size=4)
    assert eb.x.shape == (3, 4, 1)
    assert float(eb.mask.sum()) == 10.0
    assert list(np.asarray(eb.mask[2])) == [1.0, 1.0, 0.0, 0.0]


def test_batches_epoch_reshuffles():
    x = np.arange(32, dtype=np.float32).reshape(32, 1)
    y = labels_to_onehot(np.zeros(32, dtype=np.int64), 2)
    b = Batches(x, y, batch_size=8, shuffle=True)
    e0 = np.asarray(b.epoch(0).x).reshape(-1)
    e1 = np.asarray(b.epoch(1).x).reshape(-1)
    assert not np.array_equal(e0, e1)
    assert sorted(e0) == sorted(e1) == list(range(32))


def test_classwise_arrays():
    _, y_train, *_ = load_half_moons()
    x_train = np.arange(len(y_train), dtype=np.float32).reshape(-1, 1)
    per_class = classwise_arrays(x_train, y_train, n_inputs=5, num_classes=2)
    assert len(per_class) == 2
    for xc, yc in per_class:
        assert len(xc) == 5
        assert np.all(yc.argmax(-1) == yc[0].argmax(-1))


def test_synthetic_dataset_identical_across_processes(tmp_path, monkeypatch):
    """The synthetic surrogate must be byte-identical in every process —
    Python's salted str hash() once desynchronized it, making checkpoints
    trained in one process score ~chance when evaluated in another.
    Cache disabled in BOTH processes: a shared disk cache would mask a
    generator desync."""
    import os
    import subprocess
    import sys

    import numpy as np

    from robustbnns_tpu.data.datasets import _synthetic_image_dataset

    monkeypatch.setenv("ROBUSTBNNS_SYNTH_CACHE", "0")
    _synthetic_image_dataset.cache_clear()
    (x_train, y_train), _ = _synthetic_image_dataset("mnist", 28, 28, 1, 64, 16)
    out = tmp_path / "sub.npz"
    code = (
        "from robustbnns_tpu.data.datasets import _synthetic_image_dataset\n"
        "import numpy as np\n"
        "(x, y), _ = _synthetic_image_dataset('mnist', 28, 28, 1, 64, 16)\n"
        f"np.savez('{out}', x=x, y=y)\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, ROBUSTBNNS_SYNTH_CACHE="0")
    subprocess.run([sys.executable, "-c", code], check=True, cwd=repo, env=env)
    with np.load(out) as f:
        np.testing.assert_array_equal(f["x"], x_train)
        np.testing.assert_array_equal(f["y"], y_train)


def test_synthetic_disk_cache_roundtrip(tmp_path, monkeypatch):
    """Disk-cached surrogate bytes are identical to generated ones, the
    cache file is created atomically, and a corrupt cache regenerates."""
    from robustbnns_tpu.data.datasets import _synthetic_image_dataset

    monkeypatch.setenv("ROBUSTBNNS_SYNTH_CACHE", str(tmp_path))
    _synthetic_image_dataset.cache_clear()
    (xa, ya), (xta, yta) = _synthetic_image_dataset("mnist", 28, 28, 1, 48, 12)
    cache = tmp_path / "mnist_28x28x1_tr48_te12.npz"
    assert cache.exists()
    assert not list(tmp_path.glob("*.tmp"))

    _synthetic_image_dataset.cache_clear()  # force the disk-read path
    (xb, yb), (xtb, ytb) = _synthetic_image_dataset("mnist", 28, 28, 1, 48, 12)
    np.testing.assert_array_equal(xa, xb)
    np.testing.assert_array_equal(ya, yb)
    np.testing.assert_array_equal(xta, xtb)
    np.testing.assert_array_equal(yta, ytb)

    cache.write_bytes(b"not an npz")  # corrupt -> warn + regenerate + rewrite
    _synthetic_image_dataset.cache_clear()
    with pytest.warns(UserWarning, match="cache unreadable"):
        (xc, yc), _ = _synthetic_image_dataset("mnist", 28, 28, 1, 48, 12)
    np.testing.assert_array_equal(xa, xc)
    np.testing.assert_array_equal(ya, yc)
    assert cache.stat().st_size > 100  # rewritten with real contents
