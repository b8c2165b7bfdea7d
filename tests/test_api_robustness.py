"""Regression tests for the round-2 VERDICT "What's weak" API items (#3-#6)
and ADVICE findings: duck-typed ``n_samples=None`` on BNNs, un-introspectable
forward callables, streaming epoch logs, shard_axis replication warning, and
the HMC chunk-size guard.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.config import BNNConfig
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.models import BNN


@pytest.fixture(scope="module")
def moons():
    return load_dataset("half_moons", n_inputs=200)


def _tiny_bnn(moons, inference):
    x_train, y_train, _, _, inp_shape, out_size = moons
    cfg = BNNConfig(
        dataset="half_moons", hidden_size=16, activation="leaky",
        architecture="fc2", inference=inference, epochs=2, lr=0.01,
        n_samples=6, warmup=4,
    )
    bnn = BNN.from_config(cfg, inp_shape, out_size, n_inputs=200)
    bnn.train(x_train, y_train, batch_size=64, verbose=False)
    return bnn


# --------------------------------------------------------------------------- #
# weak #3: n_samples=None must mean "the model's default", never crash
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("inference", ["svi", "hmc"])
def test_predictive_fn_none_samples(moons, inference):
    bnn = _tiny_bnn(moons, inference)
    x = jnp.asarray(moons[0][:8])
    fn = bnn.predictive_fn(n_samples=None)
    out = fn(x) if inference == "hmc" else fn(x, jax.random.key(0))
    assert out.shape == (8, 2)
    # None == the reference default of 10 — same memoized closure.
    assert bnn.predictive_fn(n_samples=None) is bnn.predictive_fn(n_samples=10)
    probs = bnn.forward(x, n_samples=None, key=jax.random.key(0))
    assert probs.shape == (8, 2)


@pytest.mark.parametrize("inference", ["svi", "hmc"])
def test_attack_with_none_samples(moons, inference):
    """The duck-typed driver path the reference allows for deterministic
    models (``adversarialAttacks.py:111``) must work on BNNs too."""
    from robustbnns_tpu.attacks import attack, attack_evaluation

    bnn = _tiny_bnn(moons, inference)
    x, y = moons[2][:16], moons[3][:16]
    x_adv = attack(bnn, x, y, method="fgsm", n_samples=None, save=False,
                   verbose=False)
    assert x_adv.shape == x.shape
    acc, adv_acc, rob = attack_evaluation(
        bnn, x, x_adv, y, n_samples=None, verbose=False
    )
    assert 0.0 <= float(jnp.mean(rob)) <= 1.0  # rob is pointwise (reference :53)


# --------------------------------------------------------------------------- #
# weak #4: un-introspectable callables fail loudly at the boundary
# --------------------------------------------------------------------------- #


def test_normalize_forward_uninspectable_raises():
    from robustbnns_tpu.predict import normalize_forward

    with pytest.raises(TypeError, match="cannot introspect"):
        normalize_forward(zip)  # builtin type: inspect.signature raises


def test_normalize_forward_attribute_rejecting_callable():
    """Introspectable callables that reject attributes (ufuncs) must still
    normalize — the memoization marker is best-effort."""
    from robustbnns_tpu.predict import normalize_forward

    fn = normalize_forward(np.add)  # 2-arg ufunc, no attribute support
    np.testing.assert_array_equal(fn(np.ones(3), np.ones(3)), np.full(3, 2.0))


# --------------------------------------------------------------------------- #
# weak #5: per-epoch logs stream as epochs complete
# --------------------------------------------------------------------------- #


def test_svi_train_streams_epoch_lines(moons, capsys):
    from robustbnns_tpu.inference.svi import svi_train
    from robustbnns_tpu.models.architectures import build_architecture

    x_train, y_train, _, _, inp_shape, out_size = moons
    arch = build_architecture("fc2", "leaky", inp_shape, out_size, 16)
    _, history = svi_train(
        arch, x_train, y_train, epochs=2, lr=0.01, batch_size=64, verbose=True
    )
    out = capsys.readouterr().out
    assert "[Epoch 1]" in out and "[Epoch 2]" in out
    assert len(history["loss"]) == 2


def test_train_ensemble_streams_epoch_lines(moons, capsys):
    from robustbnns_tpu.models.architectures import build_architecture
    from robustbnns_tpu.models.ensemble import train_ensemble

    x_train, y_train, _, _, inp_shape, out_size = moons
    arch = build_architecture("fc2", "leaky", inp_shape, out_size, 16)
    ens = train_ensemble(
        arch, x_train, y_train, ensemble_size=3, epochs=2, lr=0.01,
        batch_size=64, verbose=True,
    )
    out = capsys.readouterr().out
    assert "[Ensemble epoch 1]" in out and "[Ensemble epoch 2]" in out
    assert ens.ensemble_size == 3


# --------------------------------------------------------------------------- #
# weak #6: silent de-parallelization warns once per shape
# --------------------------------------------------------------------------- #


def test_shard_axis_warns_once_on_ragged(recwarn):
    from robustbnns_tpu.parallel.mesh import make_mesh, shard_axis

    mesh = make_mesh()  # 8 virtual CPU devices
    n = mesh.shape["data"]
    ragged = jnp.zeros((n * 3 + 1, 4))
    with pytest.warns(UserWarning, match="does not divide mesh axis"):
        shard_axis(ragged, mesh, 0, "data")
    # Second occurrence of the SAME shape: silent (once-per-shape dedup).
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        shard_axis(ragged, mesh, 0, "data")
        # Divisible shapes never warn.
        shard_axis(jnp.zeros((n * 2, 4)), mesh, 0, "data")


# --------------------------------------------------------------------------- #
# ADVICE: chunk_size guards
# --------------------------------------------------------------------------- #


def test_hmc_chunk_size_zero_rejected():
    from robustbnns_tpu.inference.hmc import HMCConfig, hmc_sample

    cfg = HMCConfig(num_samples=2, warmup=1)
    with pytest.raises(ValueError, match="chunk_size"):
        hmc_sample(lambda q: 0.5 * jnp.sum(q * q), jnp.zeros(3),
                   jax.random.key(0), cfg, chunk_size=0)


def test_nuts_negative_chunk_rejected():
    from robustbnns_tpu.inference.nuts import NUTSConfig, nuts_sample

    cfg = NUTSConfig(num_samples=2, warmup=1)
    for bad in (-1, 0):  # 0 is falsy — would silently mean "no chunking"
        with pytest.raises(ValueError, match="chunk_size"):
            nuts_sample(lambda q: 0.5 * jnp.sum(q * q), jnp.zeros(3),
                        jax.random.key(0), cfg, chunk_size=bad)
