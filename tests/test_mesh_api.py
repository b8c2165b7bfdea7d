"""User-facing ``mesh=`` wiring: every sharded API must match single-device.

The reference parallelizes its drivers with joblib process pools
(``grid_search_halfMoons.py:52-60``); here the SAME user-facing calls
(``svi_train``, ``train_nn``, ``train_ensemble``, ``attack``,
``attack_evaluation``, ``expected_loss_gradients``, ``BNN.train``) accept a
``mesh`` (or pick up a process default) and run SPMD over it. Sharding is a
placement decision, not a math decision — these tests pin that down by
asserting numerical agreement with the unsharded path on the 8-virtual-device
CPU mesh from conftest.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.config import BNNConfig
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.models import BNN, build_architecture, train_ensemble, train_nn
from robustbnns_tpu.parallel import make_mesh, set_default_mesh, use_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(n_data=4, n_sample=2)


@pytest.fixture(scope="module")
def moons():
    return load_dataset("half_moons", n_inputs=1024)


def _tree_allclose(a, b, atol=1e-5):
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=atol)


def test_svi_train_mesh_matches_single_device(moons, mesh):
    from robustbnns_tpu.inference.svi import svi_train

    x_train, y_train, *_ , inp_shape, out = moons
    arch = build_architecture("fc2", "leaky", inp_shape, out, 32)
    kwargs = dict(epochs=3, lr=0.01, batch_size=64, seed=0,
                  train_acc_samples=2, verbose=False)
    post_ref, hist_ref = svi_train(arch, x_train, y_train, **kwargs)
    post_sh, hist_sh = svi_train(arch, x_train, y_train, mesh=mesh, **kwargs)
    _tree_allclose(post_ref, post_sh, atol=1e-4)
    np.testing.assert_allclose(hist_ref["loss"], hist_sh["loss"], rtol=1e-4)


def test_train_nn_mesh_matches_single_device(moons, mesh):
    x_train, y_train, x_test, y_test, inp_shape, out = moons
    arch = build_architecture("fc", "leaky", inp_shape, out, 16)
    kwargs = dict(epochs=3, lr=0.01, batch_size=64, seed=0, verbose=False)
    m_ref = train_nn(arch, x_train, y_train, **kwargs)
    m_sh = train_nn(arch, x_train, y_train, mesh=mesh, **kwargs)
    _tree_allclose(m_ref.params, m_sh.params, atol=1e-5)


def test_train_ensemble_mesh_and_chunking_match(moons, mesh):
    x_train, y_train, *_, inp_shape, out = moons
    arch = build_architecture("fc", "leaky", inp_shape, out, 16)
    kwargs = dict(ensemble_size=4, epochs=2, lr=0.01, batch_size=64, verbose=False)
    ens_ref = train_ensemble(arch, x_train, y_train, **kwargs)
    ens_sh = train_ensemble(arch, x_train, y_train, mesh=mesh, **kwargs)
    ens_ck = train_ensemble(arch, x_train, y_train, member_chunk=2, **kwargs)
    _tree_allclose(ens_ref.stacked_params, ens_sh.stacked_params, atol=1e-5)
    # Chunked members are bit-identical: members share nothing.
    _tree_allclose(ens_ref.stacked_params, ens_ck.stacked_params, atol=0.0)


def test_bnn_train_svi_uses_default_mesh(moons, mesh):
    x_train, y_train, x_test, y_test, inp_shape, out = moons
    cfg = BNNConfig("half_moons", 32, "leaky", "fc2", "svi", epochs=3, lr=0.01)

    ref = BNN.from_config(cfg, inp_shape, out, n_inputs=1024)
    ref.train(x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False)

    with use_mesh(mesh):
        sh = BNN.from_config(cfg, inp_shape, out, n_inputs=1024)
        sh.train(x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False)
    assert set_default_mesh(None) is None  # context manager restored the default
    _tree_allclose(ref.posterior, sh.posterior, atol=1e-4)


def test_bnn_train_hmc_mesh_matches_single_device(moons, mesh):
    """HMC under a mesh: same program data-parallel over ``data``.

    Leapfrog dynamics are chaotic — the psum's reduction-order difference
    (~1 ulp in each gradient) amplifies into a *different but equally valid*
    chain, so samples can't be compared elementwise. Assert the statistical
    contract instead: the sharded chain's posterior predicts as well as the
    single-device one.
    """
    x_train, y_train, x_test, y_test, inp_shape, out = moons
    cfg = BNNConfig(
        "half_moons", 16, "leaky", "fc", "hmc",
        n_samples=20, warmup=40, step_size=0.001,
    )
    ref = BNN.from_config(cfg, inp_shape, out, n_inputs=1024)
    ref.train(x_train, y_train, batch_size=1024, verbose=False)
    sh = BNN.from_config(cfg, inp_shape, out, n_inputs=1024)
    sh.train(x_train, y_train, batch_size=1024, mesh=mesh, verbose=False)

    for leaf in jax.tree_util.tree_leaves(sh.samples):
        assert np.isfinite(np.asarray(leaf)).all()
    acc_ref = ref.evaluate(x_test, y_test, n_samples=20, verbose=False)
    acc_sh = sh.evaluate(x_test, y_test, n_samples=20, verbose=False)
    assert abs(acc_ref - acc_sh) < 10.0
    assert acc_sh > 70.0


def test_attack_and_evaluation_mesh_match(moons, mesh):
    from robustbnns_tpu.attacks.gradient_attacks import attack, attack_evaluation

    x_train, y_train, x_test, y_test, inp_shape, out = moons
    cfg = BNNConfig("half_moons", 32, "leaky", "fc2", "svi", epochs=3, lr=0.01)
    bnn = BNN.from_config(cfg, inp_shape, out, n_inputs=1024)
    bnn.train(x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False)

    x, y = x_test[:128], y_test[:128]
    for method in ("fgsm", "pgd"):
        adv_ref = attack(bnn, x, y, method=method, n_samples=3, save=False,
                         verbose=False)
        adv_sh = attack(bnn, x, y, method=method, n_samples=3, mesh=mesh,
                        save=False, verbose=False)
        np.testing.assert_allclose(
            np.asarray(adv_ref), np.asarray(adv_sh), atol=1e-5
        )

    ev_ref = attack_evaluation(bnn, x, adv_ref, y, n_samples=3, verbose=False)
    ev_sh = attack_evaluation(bnn, x, adv_ref, y, n_samples=3, mesh=mesh,
                              verbose=False)
    for r, s in zip(ev_ref, ev_sh):
        np.testing.assert_allclose(np.asarray(r), np.asarray(s), rtol=1e-5)


def test_attack_mesh_handles_ragged_tail(moons, mesh):
    """A final batch that doesn't divide the mesh replicates (still correct)."""
    from robustbnns_tpu.attacks.gradient_attacks import attack

    x_train, y_train, x_test, y_test, inp_shape, out = moons
    cfg = BNNConfig("half_moons", 32, "leaky", "fc2", "svi", epochs=2, lr=0.01)
    bnn = BNN.from_config(cfg, inp_shape, out, n_inputs=1024)
    bnn.train(x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False)

    x, y = x_test[:70], y_test[:70]  # 70 % 4 != 0
    adv_ref = attack(bnn, x, y, method="fgsm", n_samples=2, save=False, verbose=False)
    adv_sh = attack(bnn, x, y, method="fgsm", n_samples=2, mesh=mesh, save=False,
                    verbose=False)
    np.testing.assert_allclose(np.asarray(adv_ref), np.asarray(adv_sh), atol=1e-5)


def test_expected_loss_gradients_mesh_matches(moons, mesh):
    from robustbnns_tpu.analysis.gradients import expected_loss_gradients

    x_train, y_train, x_test, y_test, inp_shape, out = moons
    cfg = BNNConfig("half_moons", 32, "leaky", "fc2", "svi", epochs=3, lr=0.01)
    bnn = BNN.from_config(cfg, inp_shape, out, n_inputs=1024)
    bnn.train(x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False)

    x, y = x_test[:64], y_test[:64]
    g_ref = expected_loss_gradients(bnn, x, y, n_samples=4)
    g_sh = expected_loss_gradients(bnn, x, y, n_samples=4, mesh=mesh)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_sh), atol=1e-5)
