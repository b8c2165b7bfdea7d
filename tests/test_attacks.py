"""Attack tests: closed-form linear-model checks, Bayesian variants, eval."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.attacks import (
    attack,
    attack_evaluation,
    fgsm_attack,
    load_attack,
    pgd_attack,
    save_attack,
    softmax_difference,
    softmax_robustness,
)
from robustbnns_tpu.config import BNNConfig
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.models import BNN, build_architecture, train_nn


class _LinearModel:
    """logits = [0, w·x] — closed-form FGSM/PGD targets."""

    def __init__(self, w):
        self.w = jnp.asarray(w)

    def predictive_fn(self, n_samples=None, **_):
        w = self.w
        return lambda x: jnp.stack(
            [jnp.zeros(x.shape[0]), jnp.reshape(x, (x.shape[0], -1)) @ w], axis=-1
        )


def test_fgsm_linear_closed_form():
    """For class-0 labels, ∂CE/∂x = softmax_1 · w → sign(grad) = sign(w)."""
    w = jnp.array([1.0, -2.0, 0.5, 0.0])
    model = _LinearModel(w)
    x = jnp.full((3, 4), 0.5)
    y = jnp.zeros((3,), jnp.int32)
    eps = 0.2
    x_adv = fgsm_attack(model.predictive_fn(), x, y, epsilon=eps)
    expected = jnp.clip(x + eps * jnp.sign(w), 0.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(x_adv), np.broadcast_to(np.asarray(expected), (3, 4)), atol=1e-6
    )


def test_fgsm_clips_to_unit_box():
    w = jnp.array([5.0, -5.0])
    model = _LinearModel(w)
    x = jnp.array([[0.95, 0.05]])
    y = jnp.zeros((1,), jnp.int32)
    x_adv = fgsm_attack(model.predictive_fn(), x, y, epsilon=0.3)
    assert float(x_adv.max()) <= 1.0 and float(x_adv.min()) >= 0.0
    np.testing.assert_allclose(np.asarray(x_adv[0]), [1.0, 0.0], atol=1e-6)


def test_pgd_linear_reaches_corner():
    """PGD on a linear model lands on the ε-ball corner that maximises loss."""
    w = jnp.array([1.0, -1.0, 2.0])
    model = _LinearModel(w)
    x = jnp.full((2, 3), 0.5)
    y = jnp.zeros((2,), jnp.int32)
    eps = 0.25
    x_adv = pgd_attack(model.predictive_fn(), x, y, epsilon=eps)
    expected = jnp.clip(x + eps * jnp.sign(w), 0.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(x_adv), np.broadcast_to(np.asarray(expected), (2, 3)), atol=1e-5
    )


def test_pgd_stays_in_epsilon_ball():
    w = jnp.array([3.0, -1.0])
    model = _LinearModel(w)
    x = jnp.array([[0.4, 0.6], [0.2, 0.9]])
    y = jnp.zeros((2,), jnp.int32)
    eps = 0.1
    x_adv = pgd_attack(model.predictive_fn(), x, y, epsilon=eps)
    assert float(jnp.max(jnp.abs(x_adv - x))) <= eps + 1e-6
    assert float(x_adv.min()) >= 0.0 and float(x_adv.max()) <= 1.0


def test_pgd_no_hyperparams_defaults():
    """epsilon=None selects the reference defaults (0.5, 2/225, 40)."""
    w = jnp.array([1.0])
    model = _LinearModel(w)
    x = jnp.array([[0.5]])
    y = jnp.zeros((1,), jnp.int32)
    x_adv = pgd_attack(model.predictive_fn(), x, y, epsilon=None)
    # 40 iterations of +2/225 (clipped to eps=0.5): 40*2/225 ≈ 0.356 < 0.5
    assert float(x_adv[0, 0]) == pytest.approx(0.5 + 40 * 2 / 225, abs=1e-4)


def test_softmax_difference_double_softmax_quirk():
    """Probabilities are re-softmaxed (reference adversarialAttacks.py:36-37)."""
    p = jnp.array([[1.0, 0.0]])
    q = jnp.array([[0.0, 1.0]])
    plain = softmax_difference(p, q, renormalize=False)
    quirky = softmax_difference(p, q, renormalize=True)
    assert float(plain[0]) == pytest.approx(1.0)
    # double softmax compresses: |softmax([1,0]) - softmax([0,1])|_inf < 1
    assert float(quirky[0]) == pytest.approx(
        float(jax.nn.softmax(p)[0, 0] - jax.nn.softmax(q)[0, 0]), abs=1e-6
    )
    assert float(quirky[0]) < 0.5


def test_softmax_robustness_bounds():
    k = jax.random.key(0)
    a = jax.random.normal(k, (32, 10))
    b = jax.random.normal(jax.random.fold_in(k, 1), (32, 10))
    rob = softmax_robustness(a, b, verbose=False)
    assert rob.shape == (32,)
    assert float(rob.min()) >= 0.0 and float(rob.max()) <= 1.0


@pytest.fixture(scope="module")
def moons_setup():
    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "half_moons", n_inputs=1500
    )
    arch = build_architecture("fc2", "leaky", inp_shape, out, 32)
    nn = train_nn(arch, x_train, y_train, epochs=10, lr=0.01, verbose=False)
    return nn, x_test[:200], y_test[:200]


def test_attack_and_evaluation_nn(moons_setup):
    nn, x_test, y_test = moons_setup
    x_adv = attack(nn, x_test, y_test, method="fgsm", epsilon=0.3, save=False, verbose=False)
    assert x_adv.shape == x_test.shape
    orig_acc, adv_acc, rob = attack_evaluation(
        nn, x_test, x_adv, y_test, verbose=False
    )
    assert orig_acc > 90.0
    assert adv_acc < orig_acc  # the attack must actually hurt
    assert rob.shape == (200,)
    assert 0.0 <= float(rob.mean()) <= 1.0


def test_bayesian_fgsm_deterministic_given_key(moons_setup):
    _, x_test, y_test = moons_setup
    x_train, y_train, *_ = load_dataset("half_moons", n_inputs=800)
    cfg = BNNConfig("half_moons", 16, "leaky", "fc", "svi", epochs=5, lr=0.01)
    bnn = BNN.from_config(cfg, (1, 2, 1), 2).train(
        x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False
    )
    fn = bnn.predictive_fn(n_samples=5)
    a1 = fgsm_attack(fn, jnp.asarray(x_test[:32]), jnp.asarray(y_test[:32]), key=jax.random.key(7))
    a2 = fgsm_attack(fn, jnp.asarray(x_test[:32]), jnp.asarray(y_test[:32]), key=jax.random.key(7))
    a3 = fgsm_attack(fn, jnp.asarray(x_test[:32]), jnp.asarray(y_test[:32]), key=jax.random.key(8))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_attack_save_load_roundtrip(tmp_path, moons_setup):
    nn, x_test, y_test = moons_setup
    x_adv = attack(
        nn,
        x_test[:64],
        y_test[:64],
        method="pgd",
        epsilon=0.3,
        filename="unit_nn",
        rel_path=str(tmp_path) + "/",
        verbose=False,
    )
    loaded = load_attack(
        method="pgd", filename="unit_nn", rel_path=str(tmp_path) + "/"
    )
    np.testing.assert_array_equal(np.asarray(x_adv), np.asarray(loaded))


def test_bayesian_attack_samples_in_filename(tmp_path, moons_setup):
    nn, x_test, y_test = moons_setup
    path = save_attack(
        jnp.zeros((4, 1, 2, 1)),
        method="fgsm",
        filename="m",
        n_samples=10,
        rel_path=str(tmp_path) + "/",
    )
    assert path.endswith("m_fgsm_attackSamp=10_attack.npz")
