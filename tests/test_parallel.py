"""Sharded-path tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from robustbnns_tpu.inference.svi import elbo_loss, init_meanfield
from robustbnns_tpu.models import build_architecture
from robustbnns_tpu.parallel import (
    make_mesh,
    replicate,
    shard_batch,
    sharded_attack_grads,
    sharded_predict,
    sharded_svi_step,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(n_data=4, n_sample=2)


@pytest.fixture(scope="module")
def small_arch():
    return build_architecture("fc", "relu", (1, 2, 1), 2, 16)


def test_make_mesh_shapes():
    m = make_mesh(n_data=8, n_sample=1)
    assert m.devices.shape == (8, 1)
    m2 = make_mesh(n_sample=2)
    assert m2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_sample=2)


def test_shard_batch_places_leading_axis(mesh8):
    x = jnp.arange(32.0).reshape(32, 1)
    xs = shard_batch(x, mesh8)
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_sharded_svi_step_matches_single_device(mesh8, small_arch):
    """The data-parallel step must produce the same loss/update as unsharded."""
    arch = small_arch
    posterior = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(posterior)

    x = jax.random.uniform(jax.random.key(2), (32, 1, 2, 1))
    labels = jnp.zeros((32,), jnp.int32)
    key = jax.random.key(3)

    # sharded
    step = sharded_svi_step(arch, optimizer, mesh8)
    p_sh = replicate(posterior, mesh8)
    o_sh = replicate(opt_state, mesh8)
    p1, o1, loss_sharded = step(p_sh, o_sh, shard_batch(x, mesh8),
                                shard_batch(labels, mesh8), key)

    # single-device reference
    loss_ref, grads = jax.value_and_grad(
        lambda p: elbo_loss(arch.apply, p, key, x, labels)
    )(posterior)
    updates, _ = optimizer.update(grads, opt_state, posterior)
    p_ref = optax.apply_updates(posterior, updates)

    assert float(loss_sharded) == pytest.approx(float(loss_ref), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_predict_matches_unsharded(mesh8, small_arch):
    from robustbnns_tpu.predict import svi_predict

    arch = small_arch
    posterior = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))
    x = jax.random.uniform(jax.random.key(2), (16, 1, 2, 1))
    n_samples = 4
    keys = jax.random.split(jax.random.key(5), n_samples)

    predict = sharded_predict(arch, mesh8, n_samples)
    keys_sharded = jax.device_put(
        keys,
        jax.sharding.NamedSharding(mesh8, jax.sharding.PartitionSpec("sample")),
    )
    probs_sharded = predict(
        replicate(posterior, mesh8), shard_batch(x, mesh8), keys_sharded
    )
    probs_ref = svi_predict(arch, posterior, x, keys)
    np.testing.assert_allclose(
        np.asarray(probs_sharded), np.asarray(probs_ref), atol=1e-6
    )


def test_sharded_attack_grads_match(mesh8, small_arch):
    from robustbnns_tpu.attacks.gradient_attacks import ce_on_outputs

    arch = small_arch
    params = arch.init(jax.random.key(0))
    fwd = lambda x, key: arch.apply(params, x)

    x = jax.random.uniform(jax.random.key(2), (32, 1, 2, 1))
    labels = jnp.zeros((32,), jnp.int32)

    g_sharded = sharded_attack_grads(fwd, mesh8)(
        shard_batch(x, mesh8), shard_batch(labels, mesh8), jax.random.key(0)
    )
    g_ref = jax.grad(
        lambda xx: jnp.sum(ce_on_outputs(arch.apply(params, xx), labels))
    )(x)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), atol=1e-6)


def test_graft_entry_contract():
    """The driver contract file works on the virtual mesh."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 10)
    graft.dryrun_multichip(8)


def test_sharded_hmc_chains(mesh8):
    """Chain-parallel HMC over the sample axis matches statistics + shapes."""
    from robustbnns_tpu.inference.hmc import HMCConfig
    from robustbnns_tpu.parallel import sharded_hmc_chains

    def potential(q):
        return 0.5 * jnp.sum(q * q)

    cfg = HMCConfig(num_samples=200, warmup=50, step_size=0.3, num_steps=5)
    run = sharded_hmc_chains(potential, mesh8, cfg)
    n_chains = 2  # the mesh's sample axis
    q0 = jnp.zeros((n_chains, 4))
    keys = jax.random.split(jax.random.key(0), n_chains)
    sharding = jax.sharding.NamedSharding(mesh8, jax.sharding.PartitionSpec("sample"))
    samples, infos = run(jax.device_put(q0, sharding), jax.device_put(keys, sharding))
    assert samples.shape == (n_chains, 200, 4)
    flat = np.asarray(samples).reshape(-1)
    assert abs(flat.mean()) < 0.15 and abs(flat.std() - 1.0) < 0.15


def test_sharded_fgsm_matches_unsharded(mesh8):
    """Mesh-parallel FGSM equals the single-device attack exactly."""
    from robustbnns_tpu.attacks import fgsm_attack
    from robustbnns_tpu.config import BNNConfig
    from robustbnns_tpu.data import load_dataset
    from robustbnns_tpu.models import BNN
    from robustbnns_tpu.parallel import replicate, shard_batch, sharded_fgsm
    from robustbnns_tpu.predict import split_pure

    x_train, y_train, x_test, y_test, *_ = load_dataset("half_moons", n_inputs=400)
    cfg = BNNConfig("half_moons", 16, "leaky", "fc", "svi", epochs=2, lr=0.01)
    bnn = BNN.from_config(cfg, (1, 2, 1), 2).train(
        x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False
    )
    fn = bnn.predictive_fn(n_samples=4)
    pure_fn, state = split_pure(fn)

    x = jnp.asarray(x_test[:32])
    y = jnp.asarray(y_test[:32])
    labels = jnp.argmax(y, axis=-1)
    key = jax.random.key(5)

    adv_ref = fgsm_attack(fn, x, y, epsilon=0.3, key=key)
    run = sharded_fgsm(pure_fn, mesh8)
    adv_sh = run(
        replicate(state, mesh8), shard_batch(x, mesh8),
        shard_batch(labels, mesh8), 0.3, key,
    )
    np.testing.assert_allclose(np.asarray(adv_sh), np.asarray(adv_ref), atol=1e-6)


def test_sharded_pgd_runs_and_stays_in_ball(mesh8):
    from robustbnns_tpu.config import BNNConfig
    from robustbnns_tpu.data import load_dataset
    from robustbnns_tpu.models import BNN
    from robustbnns_tpu.parallel import replicate, shard_batch, sharded_pgd
    from robustbnns_tpu.predict import split_pure

    x_train, y_train, x_test, y_test, *_ = load_dataset("half_moons", n_inputs=400)
    cfg = BNNConfig("half_moons", 16, "leaky", "fc", "svi", epochs=2, lr=0.01)
    bnn = BNN.from_config(cfg, (1, 2, 1), 2).train(
        x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False
    )
    pure_fn, state = split_pure(bnn.predictive_fn(n_samples=2))

    x = jnp.asarray(x_test[:16])
    labels = jnp.argmax(jnp.asarray(y_test[:16]), axis=-1)
    run = sharded_pgd(pure_fn, mesh8, iters=5)
    adv = run(
        replicate(state, mesh8), shard_batch(x, mesh8),
        shard_batch(labels, mesh8), 0.2, 2.0, jax.random.key(0),
    )
    assert float(jnp.max(jnp.abs(adv - x))) <= 0.2 + 1e-6
    assert float(adv.min()) >= 0.0 and float(adv.max()) <= 1.0
