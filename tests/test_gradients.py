"""Expected-loss-gradient tests (reference lossGradients.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.analysis import (
    compute_vanishing_norms_idxs,
    expected_loss_gradients,
    load_loss_gradients,
    loss_gradients,
)
from robustbnns_tpu.config import BNNConfig
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.models import BNN, build_architecture, train_nn


@pytest.fixture(scope="module")
def trained_svi_bnn():
    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "half_moons", n_inputs=1000
    )
    cfg = BNNConfig("half_moons", 16, "leaky", "fc", "svi", epochs=5, lr=0.01)
    bnn = BNN.from_config(cfg, inp_shape, out).train(
        x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False
    )
    return bnn, x_test[:64], y_test[:64]


def test_expected_gradients_shape_and_finiteness(trained_svi_bnn):
    bnn, x, y = trained_svi_bnn
    grads = expected_loss_gradients(bnn, x, y, n_samples=10)
    assert grads.shape == x.shape
    assert np.all(np.isfinite(np.asarray(grads)))


def test_expected_gradients_deterministic_given_seeds(trained_svi_bnn):
    """Fixed seeds [0..S-1] are reused — repeated calls agree exactly."""
    bnn, x, y = trained_svi_bnn
    g1 = expected_loss_gradients(bnn, x, y, n_samples=5)
    g2 = expected_loss_gradients(bnn, x, y, n_samples=5)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    g3 = expected_loss_gradients(bnn, x, y, n_samples=5, seeds=[7, 8, 9, 10, 11])
    assert not np.array_equal(np.asarray(g1), np.asarray(g3))


def test_expected_gradients_match_manual_average(trained_svi_bnn):
    """⟨grad⟩ over S seeds equals the mean of per-seed gradients."""
    bnn, x, y = trained_svi_bnn
    per_seed = [
        np.asarray(expected_loss_gradients(bnn, x, y, n_samples=1, seeds=[s]))
        for s in range(4)
    ]
    avg = np.mean(per_seed, axis=0)
    g = np.asarray(expected_loss_gradients(bnn, x, y, n_samples=4))
    np.testing.assert_allclose(g, avg, atol=1e-5)


def test_deterministic_gradients(trained_svi_bnn):
    """n_samples=None computes working deterministic input grads."""
    _, x, y = trained_svi_bnn
    x_train, y_train, *_ = load_dataset("half_moons", n_inputs=500)
    arch = build_architecture("fc", "relu", (1, 2, 1), 2, 16)
    nn = train_nn(arch, x_train, y_train, epochs=3, lr=0.01, verbose=False)
    g = expected_loss_gradients(nn, x, y, n_samples=None)
    assert g.shape == jnp.asarray(x).shape
    assert np.any(np.asarray(g) != 0.0)


def test_loss_gradients_save_load_roundtrip(tmp_path, trained_svi_bnn):
    bnn, x, y = trained_svi_bnn
    out = loss_gradients(
        bnn,
        x,
        y,
        n_samples=3,
        filename="unit",
        savedir="unit_dir",
        rel_path=str(tmp_path) + "/",
        verbose=False,
    )
    loaded = load_loss_gradients(3, "unit", "unit_dir", str(tmp_path) + "/")
    np.testing.assert_array_equal(out, loaded)
    # squeezed (half moons (N,1,2,1) → (N,2))
    assert out.shape == (64, 2)


def test_vanishing_norms_detection():
    """Monotone-nonincreasing norms → vanishing; else increasing; zero → null."""
    # image 0: norms 3,2,1  (vanishing)
    # image 1: norms 1,2,3  (increasing)
    # image 2: all zeros    (null)
    g = np.zeros((3, 3, 2, 2), np.float32)
    for j, v in enumerate([3, 2, 1]):
        g[0, j, 0, 0] = v
    for j, v in enumerate([1, 2, 3]):
        g[1, j, 0, 0] = v
    idxs = compute_vanishing_norms_idxs(g, [1, 10, 100], norm="linfty", verbose=False)
    assert idxs == [0]
    idxs_l2 = compute_vanishing_norms_idxs(g, [1, 10, 100], norm="l2", verbose=False)
    assert idxs_l2 == [0]


def test_vanishing_norms_shape_guard():
    with pytest.raises(ValueError, match="Second dimension"):
        compute_vanishing_norms_idxs(np.zeros((2, 3, 4)), [1, 10], verbose=False)
