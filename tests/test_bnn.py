"""BNN facade tests: train/forward/evaluate/save/load for SVI and HMC."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.config import BNNConfig
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.models import BNN


@pytest.fixture(scope="module")
def moons_data():
    return load_dataset("half_moons", n_inputs=1000)


@pytest.fixture(scope="module")
def svi_bnn(moons_data):
    x_train, y_train, x_test, y_test, inp_shape, out = moons_data
    cfg = BNNConfig("half_moons", 32, "leaky", "fc2", "svi", epochs=30, lr=0.01)
    bnn = BNN.from_config(cfg, inp_shape, out, n_inputs=1000)
    bnn.train(x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False)
    return bnn


@pytest.fixture(scope="module")
def hmc_bnn(moons_data):
    x_train, y_train, x_test, y_test, inp_shape, out = moons_data
    cfg = BNNConfig(
        "half_moons",
        16,
        "leaky",
        "fc",
        "hmc",
        n_samples=30,
        warmup=60,
        step_size=0.001,
    )
    bnn = BNN.from_config(cfg, inp_shape, out, n_inputs=1000)
    bnn.train(x_train, y_train, batch_size=1024, verbose=False)
    return bnn


def test_svi_bnn_learns(svi_bnn, moons_data):
    *_, x_test, y_test, _, _ = (
        moons_data[0],
        moons_data[1],
        moons_data[2],
        moons_data[3],
        moons_data[4],
        moons_data[5],
    )
    acc = svi_bnn.evaluate(moons_data[2], moons_data[3], n_samples=10, verbose=False)
    assert acc > 70.0


def test_svi_forward_returns_probabilities(svi_bnn, moons_data):
    x = jnp.asarray(moons_data[2][:16])
    probs = svi_bnn.forward(x, n_samples=5, key=jax.random.key(0))
    assert probs.shape == (16, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_svi_avg_posterior_returns_logits(svi_bnn, moons_data):
    x = jnp.asarray(moons_data[2][:16])
    logits = svi_bnn.forward(x, avg_posterior=True)
    assert logits.shape == (16, 2)
    # raw logits are not a simplex
    assert not np.allclose(np.asarray(logits).sum(-1), 1.0, atol=1e-3)


def test_svi_seeded_forward_is_repeatable(svi_bnn, moons_data):
    x = jnp.asarray(moons_data[2][:8])
    p1 = svi_bnn.forward(x, n_samples=3, seeds=[0, 1, 2])
    p2 = svi_bnn.forward(x, n_samples=3, seeds=[0, 1, 2])
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    p3 = svi_bnn.forward(x, n_samples=3, seeds=[3, 4, 5])
    assert not np.array_equal(np.asarray(p1), np.asarray(p3))


def test_seed_count_mismatch_raises(svi_bnn, moons_data):
    x = jnp.asarray(moons_data[2][:4])
    with pytest.raises(ValueError, match="seeds should match"):
        svi_bnn.forward(x, n_samples=5, seeds=[0, 1])


def test_hmc_bnn_learns_and_stacks_samples(hmc_bnn, moons_data):
    acc = hmc_bnn.evaluate(moons_data[2], moons_data[3], n_samples=30, verbose=False)
    assert acc > 75.0
    leaves = jax.tree_util.tree_leaves(hmc_bnn.samples)
    assert all(l.shape[0] == 30 for l in leaves)


def test_hmc_forward_seeds_index_posterior(hmc_bnn, moons_data):
    x = jnp.asarray(moons_data[2][:8])
    p1 = hmc_bnn.forward(x, n_samples=2, seeds=[0, 1])
    p2 = hmc_bnn.forward(x, n_samples=2, seeds=[0, 1])
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    # default seeds are range(n_samples) — reference model_bnn.py:248-249
    p_default = hmc_bnn.forward(x, n_samples=2)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p_default))


def test_bnn_save_load_roundtrip(tmp_path, svi_bnn, hmc_bnn, moons_data):
    x = jnp.asarray(moons_data[2][:8])
    for bnn in (svi_bnn, hmc_bnn):
        rel = str(tmp_path) + "/"
        bnn.save(rel_path=rel)
        clone = BNN.from_config(bnn.config, (1, 2, 1), 2, n_inputs=1000)
        clone.load(rel_path=rel)
        if bnn.config.inference == "svi":
            ref = bnn.forward(x, n_samples=3, seeds=[0, 1, 2])
            got = clone.forward(x, n_samples=3, seeds=[0, 1, 2])
        else:
            ref = bnn.forward(x, n_samples=3)
            got = clone.forward(x, n_samples=3)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_bnn_name_matches_reference_scheme(svi_bnn, hmc_bnn):
    assert (
        svi_bnn.name
        == "half_moons_bnn_svi_hid=32_act=leaky_arch=fc2_inp=1000_ep=30_lr=0.01"
    )
    assert (
        hmc_bnn.name
        == "half_moons_bnn_hmc_hid=16_act=leaky_arch=fc_inp=1000"
        "_samp=30_warm=60_stepsize=0.001_numsteps=10"
    )


def test_predictive_closures_carry_pure_split(svi_bnn, hmc_bnn):
    """Heavy model state must ride jits as traced args, not baked constants.

    Regression guard for the remote-compile blowup: a 100-sample HMC posterior
    captured as jit constants inflates the compile payload by ~100x the
    parameter count (observed to take down the remote TPU compiler).
    """
    from robustbnns_tpu.predict import split_pure

    for fn in (
        svi_bnn.predictive_fn(n_samples=3),
        svi_bnn.predictive_fn(n_samples=3, seeds=[0, 1, 2]),
        svi_bnn.predictive_fn(n_samples=3, avg_posterior=True),
        hmc_bnn.predictive_fn(n_samples=3),
    ):
        pure_fn, state = split_pure(fn)
        assert pure_fn is not None and state is not None


def test_cache_invalidated_on_load(tmp_path, svi_bnn, moons_data):
    """predictive_fn closures must not survive a load() that swaps the state."""
    import jax.numpy as jnp

    x = jnp.asarray(moons_data[2][:4])
    fn_before = svi_bnn.predictive_fn(n_samples=2, seeds=[0, 1])
    svi_bnn.save(rel_path=str(tmp_path) + "/")
    svi_bnn.load(rel_path=str(tmp_path) + "/")
    fn_after = svi_bnn.predictive_fn(n_samples=2, seeds=[0, 1])
    assert fn_before is not fn_after
