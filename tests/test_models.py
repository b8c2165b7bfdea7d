"""Architecture + deterministic-training tests (reference model_nn.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.models import (
    build_architecture,
    evaluate_nn,
    train_nn,
)
from robustbnns_tpu.utils.pytree import tree_size


@pytest.mark.parametrize("arch_name", ["fc", "fc2", "conv", "conv2"])
def test_architectures_shapes(arch_name):
    arch = build_architecture(
        arch_name, "leaky", (28, 28, 1), 10, 32, dataset_name="mnist"
    )
    params = arch.init(jax.random.key(0))
    x = jnp.zeros((4, 28, 28, 1))
    logits = arch.apply(params, x)
    assert logits.shape == (4, 10)


def test_conv_flatten_matches_reference_head_dim():
    """The conv head is Linear(hidden/16·input_size, out) — model_nn.py:106."""
    arch = build_architecture("conv", "relu", (28, 28, 1), 10, 64, "mnist")
    params = arch.init(jax.random.key(0))
    w = params[2]["w"]
    assert w.shape[0] == (64 // 16) * 28 * 28


def test_hidden_size_validation():
    with pytest.raises(ValueError):
        build_architecture("fc", "relu", (28, 28, 1), 10, 100)
    with pytest.raises(ValueError):
        build_architecture("fc", "relu", (28, 28, 1), 10, 8)
    with pytest.raises(ValueError):
        build_architecture("fc", "nope", (28, 28, 1), 10, 32)


def test_conv_rejects_non_mnist():
    with pytest.raises(NotImplementedError):
        build_architecture("conv", "relu", (32, 32, 3), 10, 32, "cifar")
    # conv2 accepts cifar (reference model_nn.py:108-121 has no dataset guard)
    arch = build_architecture("conv2", "relu", (32, 32, 3), 10, 32, "cifar")
    params = arch.init(jax.random.key(0))
    assert arch.apply(params, jnp.zeros((2, 32, 32, 3))).shape == (2, 10)


def test_nchw_input_shape_accepted():
    """Reference passes CHW shapes like (1, 28, 28); we normalize to HWC."""
    a1 = build_architecture("fc", "relu", (1, 28, 28), 10, 32)
    a2 = build_architecture("fc", "relu", (28, 28, 1), 10, 32)
    assert a1.input_shape == a2.input_shape == (28, 28, 1)


def test_init_statistics_match_torch_default():
    """torch Linear init is U(±1/sqrt(fan_in)) — bounds must match."""
    arch = build_architecture("fc", "relu", (28, 28, 1), 10, 256)
    params = arch.init(jax.random.key(0))
    w = np.asarray(params[0]["w"])
    bound = 1.0 / np.sqrt(784)
    assert w.min() >= -bound and w.max() <= bound
    assert w.std() == pytest.approx(2 * bound / np.sqrt(12), rel=0.05)


def test_vmap_over_params_axis():
    """Stacked params (the BNN/ensemble representation) vmap cleanly."""
    arch = build_architecture("fc2", "tanh", (1, 2, 1), 2, 16)
    keys = jax.random.split(jax.random.key(0), 5)
    stacked = jax.vmap(arch.init)(keys)
    x = jnp.ones((3, 1, 2, 1))
    out = jax.vmap(arch.apply, in_axes=(0, None))(stacked, x)
    assert out.shape == (5, 3, 2)
    assert tree_size(stacked) == 5 * tree_size(arch.init(keys[0]))


def test_train_nn_learns_half_moons():
    x_train, y_train, x_test, y_test, inp_shape, out_size = load_dataset(
        "half_moons", n_inputs=2000
    )
    arch = build_architecture("fc2", "leaky", inp_shape, out_size, 32)
    model = train_nn(
        arch, x_train, y_train, epochs=10, lr=0.01, batch_size=64, verbose=False
    )
    acc = evaluate_nn(model, x_test, y_test, verbose=False)
    assert acc > 95.0


def test_train_nn_deterministic():
    x_train, y_train, *_ = load_dataset("half_moons", n_inputs=200)
    arch = build_architecture("fc", "relu", (1, 2, 1), 2, 16)
    m1 = train_nn(arch, x_train, y_train, epochs=2, lr=0.01, verbose=False)
    m2 = train_nn(arch, x_train, y_train, epochs=2, lr=0.01, verbose=False)
    for a, b in zip(
        jax.tree_util.tree_leaves(m1.params), jax.tree_util.tree_leaves(m2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_matmul_optin(monkeypatch):
    """ROBUSTBNNS_BF16=1 changes only precision, not semantics."""
    import os

    arch = build_architecture("fc2", "leaky", (1, 2, 1), 2, 16)
    params = arch.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (8, 1, 2, 1))
    monkeypatch.delenv("ROBUSTBNNS_BF16", raising=False)
    ref = np.asarray(arch.apply(params, x))
    monkeypatch.setenv("ROBUSTBNNS_BF16", "1")
    got = np.asarray(arch.apply(params, x))
    assert got.dtype == np.float32  # f32 accumulation/output
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    assert not np.array_equal(got, ref)  # precision actually changed
