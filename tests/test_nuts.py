"""NUTS engine tests: internals, Gaussian recovery, BNN integration.

Mirrors tests/test_hmc.py plus NUTS-specific checks (U-turn bookkeeping,
adaptive trajectory lengths, divergence detection).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.inference.nuts import (
    NUTSConfig,
    _trailing_ones,
    nuts_sample,
)


def _std_normal_potential(q):
    return 0.5 * jnp.sum(q * q)


def test_trailing_ones():
    expected = {0: 0, 1: 1, 2: 0, 3: 2, 5: 1, 7: 3, 11: 2, 12: 0, 15: 4}
    for i, n in expected.items():
        assert int(_trailing_ones(jnp.asarray(i, jnp.int32))) == n


def test_nuts_recovers_standard_normal():
    cfg = NUTSConfig(num_samples=2000, warmup=500, step_size=0.5)
    samples, info = nuts_sample(
        _std_normal_potential, jnp.zeros((4,)), jax.random.key(0), cfg
    )
    assert samples.shape == (2000, 4)
    assert float(jnp.mean(info.accept_stat)) > 0.6
    assert not bool(jnp.any(info.diverging))
    flat = np.asarray(samples).reshape(-1)
    assert abs(flat.mean()) < 0.1
    assert abs(flat.std() - 1.0) < 0.1


def test_nuts_recovers_shifted_scaled_gaussian():
    mean = jnp.array([1.0, -2.0])
    scale = jnp.array([0.5, 2.0])

    def potential(q):
        z = (q - mean) / scale
        return 0.5 * jnp.sum(z * z)

    cfg = NUTSConfig(num_samples=2000, warmup=1000, step_size=0.5)
    samples, _ = nuts_sample(potential, jnp.zeros((2,)), jax.random.key(42), cfg)
    s = np.asarray(samples)
    np.testing.assert_allclose(s.mean(0), np.asarray(mean), atol=0.15)
    np.testing.assert_allclose(s.std(0), np.asarray(scale), rtol=0.25)


def test_nuts_trajectory_length_adapts_to_scale():
    """On an anisotropic target (unit mass, no adaptation) NUTS must take
    longer trajectories than on an isotropic one — the whole point of the
    no-U-turn criterion."""
    aniso_scale = jnp.array([1.0, 100.0])

    def aniso(q):
        z = q / aniso_scale
        return 0.5 * jnp.sum(z * z)

    cfg = NUTSConfig(
        num_samples=200, warmup=0, step_size=0.5,
        adapt_step_size=False, adapt_mass_matrix=False,
    )
    _, info_iso = nuts_sample(
        _std_normal_potential, jnp.zeros((2,)), jax.random.key(0), cfg
    )
    _, info_aniso = nuts_sample(aniso, jnp.zeros((2,)), jax.random.key(0), cfg)
    assert float(jnp.mean(info_aniso.num_leapfrog)) > 4 * float(
        jnp.mean(info_iso.num_leapfrog)
    )


def test_nuts_max_depth_bounds_leapfrogs():
    cfg = NUTSConfig(
        num_samples=100, warmup=0, step_size=0.01, max_depth=4,
        adapt_step_size=False, adapt_mass_matrix=False,
    )
    _, info = nuts_sample(
        _std_normal_potential, jnp.zeros((2,)), jax.random.key(1), cfg
    )
    # total leaves after d doublings = 2^d - 1 new leaves
    assert int(jnp.max(info.num_leapfrog)) <= 2**4 - 1


def test_nuts_multi_chain_shapes():
    cfg = NUTSConfig(num_samples=50, warmup=20, step_size=0.5, num_chains=3)
    samples, info = nuts_sample(
        _std_normal_potential, jnp.zeros((4,)), jax.random.key(0), cfg
    )
    assert samples.shape == (3, 50, 4)
    assert info.accept_stat.shape == (3, 50)


def test_nuts_sharp_posterior_mixes():
    """The regression target from HMC: razor-sharp Gaussian, bad initial step."""
    scale = 1e-3

    def potential(q):
        return 0.5 * jnp.sum((q / scale) ** 2)

    cfg = NUTSConfig(num_samples=500, warmup=300, step_size=0.5)
    samples, info = nuts_sample(
        potential, jnp.full((4,), 0.02), jax.random.key(0), cfg
    )
    s = np.asarray(samples)
    assert float(np.abs(s[-100:]).mean()) < 10 * scale
    assert float(s[-100:].std()) > 0.3 * scale
    assert float(jnp.mean(info.accept_stat)) > 0.4


def test_nuts_data_traced_potential_and_batched_driver():
    """sampler='nuts' slots into the reference-semantics training driver."""
    from robustbnns_tpu.inference.hmc import hmc_train_batched

    def potential_fn(q, x, labels):
        center = jnp.mean(x)
        return 0.5 * jnp.sum((q - center) ** 2)

    batches = [
        (jnp.full((4,), 0.0), jnp.zeros((4,), jnp.int32)),
        (jnp.full((4,), 5.0), jnp.zeros((4,), jnp.int32)),
    ]
    samples, _ = hmc_train_batched(
        potential_fn,
        batches,
        jnp.zeros((3,)),
        jax.random.key(0),
        n_samples=40,
        warmup=100,
        step_size=0.3,
        mode="faithful",
        sampler="nuts",
        verbose=False,
    )
    assert samples.shape == (40, 3)
    # Faithful semantics preserved: conditioned on the LAST batch only.
    assert abs(float(samples.mean()) - 5.0) < 1.0


def test_bnn_trains_with_nuts_from_random_init():
    """The capability HMC lacks: full-batch NUTS mixes from a random init."""
    from robustbnns_tpu.config import BNNConfig
    from robustbnns_tpu.data import load_dataset
    from robustbnns_tpu.models import BNN

    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "half_moons", n_inputs=2000
    )
    cfg = BNNConfig("half_moons", 16, "leaky", "fc", "hmc",
                    n_samples=30, warmup=60, step_size=0.01)
    bnn = BNN.from_config(cfg, inp_shape, out).train(
        x_train, y_train, batch_size=2000, hmc_mode="full",
        hmc_sampler="nuts", verbose=False,
    )
    acc = bnn.evaluate(x_test, y_test, n_samples=30, verbose=False)
    assert acc > 85.0


def test_nuts_chunked_dispatch_bit_identical():
    """chunk_size bounds per-dispatch work for the remote-TPU backend; the
    carried state and key-split structure make any chunking bit-identical to
    the monolithic scan."""
    import jax
    import jax.numpy as jnp

    from robustbnns_tpu.inference.nuts import NUTSConfig, nuts_sample

    def potential(q):
        return 0.5 * jnp.sum(q * q) + 0.1 * jnp.sum(q**4)

    cfg = NUTSConfig(num_samples=12, warmup=14, max_depth=5)
    q0 = jnp.full((4,), 1.5)
    s_mono, i_mono = nuts_sample(potential, q0, jax.random.key(3), cfg)
    for chunk in (1, 5):
        s_chunk, i_chunk = nuts_sample(
            potential, q0, jax.random.key(3), cfg, chunk_size=chunk
        )
        assert bool(jnp.all(s_mono == s_chunk))
        assert bool(jnp.all(i_mono.step_size == i_chunk.step_size))
        assert bool(jnp.all(i_mono.inv_mass == i_chunk.inv_mass))
        assert bool(jnp.all(i_mono.num_leapfrog == i_chunk.num_leapfrog))


def test_subtree_checkpoint_stack_balanced():
    """Every node a leaf opens must be closed by a later leaf: for a complete
    (non-terminated) build the checkpoint stack pointer ends at 0 at every
    depth. The original one-push-per-even-leaf scheme underflowed for any
    subtree of >=4 leaves, silently voiding the sub-U-turn checks for
    size->=4 nodes (round-2 review finding)."""
    import jax
    import jax.numpy as jnp

    from robustbnns_tpu.inference.nuts import _build_subtree

    U = lambda q: jnp.sum(q) * 0.0  # free particle: never U-turns
    vg_u = jax.value_and_grad(U)
    g0 = vg_u(jnp.zeros(3))[1]
    for depth in range(5):
        out = _build_subtree(
            U, vg_u, jnp.asarray(0.0), jnp.zeros(3), jnp.ones(3), g0, 1.0,
            jnp.asarray(depth, jnp.int32), 0.1, jnp.ones(3), 6,
            jax.random.key(0),
        )
        n_done, turning, sp_end = out[6], out[7], out[9]
        assert int(n_done) == 2**depth
        assert not bool(turning)
        assert int(sp_end) == 0


def test_subtree_matches_explicit_leapfrog():
    """The cached-gradient leaf (one value_and_grad per step) must produce
    the same trajectory as the textbook two-gradient velocity-Verlet — the
    caching is a reuse of an identical quantity, not an approximation."""
    from robustbnns_tpu.inference.nuts import _build_subtree

    U = lambda q: 0.5 * jnp.sum(q * q) + jnp.sum(jnp.cos(q))
    vg_u = jax.value_and_grad(U)
    grad_u = jax.grad(U)
    q0 = jnp.array([0.3, -1.2, 0.7])
    p0 = jnp.array([1.0, 0.5, -0.25])
    eps, depth = 0.05, 3

    out = _build_subtree(
        U, vg_u, U(q0) + 0.5 * jnp.sum(p0 * p0), q0, p0, grad_u(q0), 1.0,
        jnp.asarray(depth, jnp.int32), eps, jnp.ones(3), 6, jax.random.key(1),
    )
    q_end, p_end, n_done, turning, g_end = out[0], out[1], out[6], out[7], out[10]
    assert int(n_done) == 2**depth  # smooth short trajectory: no early stop
    assert not bool(turning)

    q, p = q0, p0
    for _ in range(2**depth):
        p = p - 0.5 * eps * grad_u(q)
        q = q + eps * p
        p = p - 0.5 * eps * grad_u(q)
    np.testing.assert_allclose(np.asarray(q_end), np.asarray(q), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_end), np.asarray(p), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_end), np.asarray(grad_u(q)), rtol=1e-6
    )


def test_one_potential_eval_per_leapfrog():
    """The round-5b economy claim: a NUTS draw evaluates the potential exactly
    n_leapfrog + 1 times (one fused value_and_grad per tree leaf plus the
    root's H0 evaluation) — not the naive 3 per leaf."""
    import jax.experimental

    count = np.zeros((), np.int64)

    def bump(x):
        nonlocal count
        count += 1
        return np.asarray(0.0, np.float32)

    @jax.custom_jvp
    def tick_fn(x):
        return jax.experimental.io_callback(
            bump, jax.ShapeDtypeStruct((), jnp.float32), x
        )

    @tick_fn.defjvp
    def _tick_jvp(primals, tangents):
        # Zero tangent: differentiation must not add callback executions.
        return tick_fn(primals[0]), jnp.zeros((), jnp.float32)

    def potential(q):
        return 0.5 * jnp.sum(q * q) + tick_fn(q[0])

    cfg = NUTSConfig(
        num_samples=20, warmup=0, step_size=0.25, adapt_step_size=False,
        adapt_mass_matrix=False,
    )
    samples, info = nuts_sample(
        potential, jnp.zeros((4,)), jax.random.key(3), cfg
    )
    expected = int(jnp.sum(info.num_leapfrog)) + cfg.num_samples
    assert int(count) == expected


def test_flat_transition_matches_nested():
    """The flat single-loop transition (shipped) must be bit-identical to the
    nested two-loop reference formulation: same PRNG split schedule, same
    float ops in the same order — across many sequential draws so edge
    carries, subtree merges, early U-turn exits and max-depth exits are all
    exercised."""
    from robustbnns_tpu.inference.nuts import (
        _nuts_transition,
        _nuts_transition_nested,
    )

    mean = jnp.array([1.0, -2.0, 0.5])
    scale = jnp.array([0.3, 2.0, 1.0])

    def potential(q):
        z = (q - mean) / scale
        return 0.5 * jnp.sum(z * z) + 0.1 * jnp.sum(jnp.cos(q))

    for max_depth, eps in [(6, 0.25), (2, 0.9)]:  # deep trees / depth exits
        flat = jax.jit(_nuts_transition(potential, max_depth))
        nested = jax.jit(_nuts_transition_nested(potential, max_depth))
        inv_mass = jnp.array([1.0, 0.5, 2.0])

        def run(transition):
            q = jnp.zeros((3,))
            outs = []
            for s in range(40):
                q, acc, n_lf, div = transition(
                    q, jax.random.key(s), eps, inv_mass
                )
                outs.append((q, acc, n_lf, div))
            return outs

        for of, on in zip(run(flat), run(nested)):
            for a, b in zip(of, on):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trailing_zeros():
    from robustbnns_tpu.inference.nuts import _trailing_zeros

    expected = {1: 0, 2: 1, 3: 0, 4: 2, 6: 1, 8: 3, 12: 2, 16: 4}
    for i, n in expected.items():
        assert int(_trailing_zeros(jnp.asarray(i, jnp.int32))) == n
    assert int(_trailing_zeros(jnp.asarray(0, jnp.int32))) == 32
