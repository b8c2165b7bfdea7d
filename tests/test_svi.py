"""SVI engine tests: analytic KL, ELBO gradients, end-to-end learning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.inference.svi import (
    MeanFieldPosterior,
    elbo_loss,
    gaussian_kl_to_std_normal,
    init_meanfield,
    sample_meanfield,
    svi_train,
)
from robustbnns_tpu.models import build_architecture


def _toy_posterior(loc_val, rho_val, shape=(3, 2)):
    loc = (jnp.full(shape, loc_val),)
    rho = (jnp.full(shape, rho_val),)
    return MeanFieldPosterior(loc=loc, rho=rho)


def test_kl_closed_form():
    """KL(N(mu, sigma) || N(0,1)) = 0.5(sigma^2 + mu^2 - 1) - log sigma, summed."""
    mu, rho = 0.7, -0.3
    sigma = float(jax.nn.softplus(jnp.array(rho)))
    expected_per = 0.5 * (sigma**2 + mu**2 - 1.0) - np.log(sigma)
    post = _toy_posterior(mu, rho, shape=(4, 5))
    kl = float(gaussian_kl_to_std_normal(post))
    assert kl == pytest.approx(20 * expected_per, rel=1e-5)


def test_kl_zero_at_prior():
    """q == prior (mu=0, sigma=1) gives KL == 0."""
    rho_for_unit_sigma = float(np.log(np.e - 1.0))  # softplus(rho) = 1
    post = _toy_posterior(0.0, rho_for_unit_sigma, shape=(10,))
    assert float(gaussian_kl_to_std_normal(post)) == pytest.approx(0.0, abs=1e-5)


def test_sample_meanfield_statistics():
    post = _toy_posterior(2.0, 0.5, shape=(2000,))
    keys = jax.random.split(jax.random.key(0), 200)
    draws = jax.vmap(lambda k: sample_meanfield(post, k)[0])(keys)
    sigma = float(jax.nn.softplus(jnp.array(0.5)))
    assert float(draws.mean()) == pytest.approx(2.0, abs=0.01)
    assert float(draws.std()) == pytest.approx(sigma, rel=0.02)


def test_elbo_loss_is_finite_and_differentiable():
    arch = build_architecture("fc", "relu", (1, 2, 1), 2, 16)
    post = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))
    x = jnp.ones((8, 1, 2, 1))
    labels = jnp.zeros((8,), jnp.int32)
    loss, grads = jax.value_and_grad(
        lambda p: elbo_loss(arch.apply, p, jax.random.key(2), x, labels)
    )(post)
    assert jnp.isfinite(loss)
    for g in jax.tree_util.tree_leaves(grads):
        assert jnp.all(jnp.isfinite(g))


def test_svi_learns_half_moons():
    """End-to-end SVI learning with the reference objective.

    NOTE the ceiling here is intrinsic to the reference's ELBO: the full KL is
    counted once per *batch* step with no batch/dataset rescaling (Pyro plates
    without ``subsample_size``, reference ``model_bnn.py:116-119,325``), so on
    a tiny fc2(32) model the posterior equilibrates near the prior scale and
    the 10-sample predictive plateaus around ~80% on half moons. Faithfully
    reproduced; asserted loosely.
    """
    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "half_moons", n_inputs=2000
    )
    arch = build_architecture("fc2", "leaky", inp_shape, out, 32)
    posterior, history = svi_train(
        arch,
        x_train,
        y_train,
        epochs=30,
        lr=0.01,
        batch_size=64,
        train_acc_samples=10,
        verbose=False,
    )
    assert history["accuracy"][-1] > 70.0
    assert history["accuracy"][-1] > history["accuracy"][0] + 10.0
    assert min(history["loss"][-3:]) < history["loss"][0]


def test_svi_train_deterministic_given_seed():
    x_train, y_train, *_ = load_dataset("half_moons", n_inputs=200)
    arch = build_architecture("fc", "relu", (1, 2, 1), 2, 16)
    p1, _ = svi_train(
        arch, x_train, y_train, epochs=2, lr=0.01, train_acc_samples=0, verbose=False
    )
    p2, _ = svi_train(
        arch, x_train, y_train, epochs=2, lr=0.01, train_acc_samples=0, verbose=False
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_acc_bf16_is_metric_only():
    """The bf16 train-accuracy fast path must not touch the optimization: the
    trained posterior is identical to the f32 run, and the accuracy metric
    stays argmax-close."""
    x_train, y_train, *_ , inp_shape, out_size = load_dataset(
        "half_moons", n_inputs=300
    )
    arch = build_architecture("fc2", "leaky", inp_shape, out_size, 16)
    post_a, hist_a = svi_train(
        arch, x_train, y_train, epochs=2, lr=0.01, batch_size=64,
        train_acc_bf16=False, verbose=False,
    )
    post_b, hist_b = svi_train(
        arch, x_train, y_train, epochs=2, lr=0.01, batch_size=64,
        train_acc_bf16=True, verbose=False,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(post_a), jax.tree_util.tree_leaves(post_b)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(hist_a["loss"], hist_b["loss"], rtol=1e-5)
    # metric itself: bf16 rounding may flip rare near-ties, nothing more
    for acc_a, acc_b in zip(hist_a["accuracy"], hist_b["accuracy"]):
        assert abs(acc_a - acc_b) <= 2.0
