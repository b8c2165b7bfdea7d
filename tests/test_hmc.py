"""HMC engine tests: energy conservation, reversibility, Gaussian recovery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.inference.hmc import (
    HMCConfig,
    _kinetic,
    _leapfrog,
    hmc_sample,
    hmc_train_batched,
)


def _std_normal_potential(q):
    return 0.5 * jnp.sum(q * q)


def test_leapfrog_conserves_energy():
    """Small-step leapfrog on a Gaussian conserves the Hamiltonian to O(eps^2)."""
    key = jax.random.key(0)
    q = jax.random.normal(key, (10,))
    p = jax.random.normal(jax.random.key(1), (10,))
    inv_mass = jnp.ones((10,))
    h0 = _std_normal_potential(q) + _kinetic(p, inv_mass)
    q1, p1 = _leapfrog(_std_normal_potential, q, p, 0.01, inv_mass, 50)
    h1 = _std_normal_potential(q1) + _kinetic(p1, inv_mass)
    assert abs(float(h1 - h0)) < 1e-3
    # and the state actually moved
    assert float(jnp.linalg.norm(q1 - q)) > 0.1


def test_leapfrog_is_reversible():
    """Integrating forward then backward (negated momentum) returns the start."""
    q = jnp.array([1.0, -2.0, 0.5])
    p = jnp.array([0.3, 0.1, -0.7])
    inv_mass = jnp.ones((3,))
    q1, p1 = _leapfrog(_std_normal_potential, q, p, 0.05, inv_mass, 20)
    q2, p2 = _leapfrog(_std_normal_potential, q1, -p1, 0.05, inv_mass, 20)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(-p2), np.asarray(p), atol=1e-5)


def test_hmc_recovers_standard_normal():
    """Sampling N(0, I): moments must match."""
    cfg = HMCConfig(num_samples=2000, warmup=500, step_size=0.2, num_steps=8)
    samples, info = hmc_sample(
        _std_normal_potential, jnp.zeros((4,)), jax.random.key(0), cfg
    )
    assert samples.shape == (2000, 4)
    assert float(jnp.mean(info.accept_prob)) > 0.6
    flat = np.asarray(samples).reshape(-1)
    assert abs(flat.mean()) < 0.1
    assert abs(flat.std() - 1.0) < 0.1


def test_hmc_recovers_correlated_gaussian_mean():
    """A shifted/scaled Gaussian: mean and marginal stds recovered."""
    mean = jnp.array([1.0, -2.0])
    scale = jnp.array([0.5, 2.0])

    def potential(q):
        z = (q - mean) / scale
        return 0.5 * jnp.sum(z * z)

    cfg = HMCConfig(num_samples=2000, warmup=1000, step_size=0.2, num_steps=8)
    samples, _ = hmc_sample(potential, jnp.zeros((2,)), jax.random.key(42), cfg)
    s = np.asarray(samples)
    np.testing.assert_allclose(s.mean(0), np.asarray(mean), atol=0.15)
    np.testing.assert_allclose(s.std(0), np.asarray(scale), rtol=0.25)


def test_hmc_multi_chain_shapes():
    cfg = HMCConfig(num_samples=50, warmup=20, step_size=0.2, num_chains=3)
    samples, info = hmc_sample(
        _std_normal_potential, jnp.zeros((4,)), jax.random.key(0), cfg
    )
    assert samples.shape == (3, 50, 4)
    assert info.accept_prob.shape == (3, 50)


def test_hmc_fixed_step_mode():
    cfg = HMCConfig(
        num_samples=100,
        warmup=50,
        step_size=0.25,
        adapt_step_size=False,
        adapt_mass_matrix=False,
    )
    samples, info = hmc_sample(
        _std_normal_potential, jnp.zeros((2,)), jax.random.key(0), cfg
    )
    assert float(info.step_size) == pytest.approx(0.25)
    np.testing.assert_array_equal(np.asarray(info.inv_mass), np.ones(2))


def test_hmc_train_batched_faithful_resamples_last_batch():
    """Faithful mode: n_samples draws resampled from the last batch's chain."""

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
        num_steps=5,
        mode="faithful",
        verbose=False,
    )
    assert samples.shape == (40, 3)
    # Conditioned only on the LAST batch (center 5.0), not the first.
    assert abs(float(samples.mean()) - 5.0) < 1.0
    # Resampling with replacement from 40//2+1=21 stored draws → duplicates.
    assert len(np.unique(np.asarray(samples)[:, 0])) < 40


def test_hmc_train_batched_full_mode_uses_all_data():
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
        n_samples=200,
        warmup=100,
        step_size=0.3,
        num_steps=5,
        mode="full",
        verbose=False,
    )
    # Full mode concatenates: center = 2.5.
    assert abs(float(samples.mean()) - 2.5) < 0.5


def test_sharp_posterior_survives_bad_initial_step():
    """A razor-sharp target with a hopeless initial step must still mix.

    Regression for the 60k-point full-batch HMC collapse: without the
    find-reasonable-step-size initialization, dual averaging from a too-large
    step drives eps to ~0 within warmup and the chain never leaves its init.
    """
    scale = 1e-3  # very sharp

    def potential(q):
        return 0.5 * jnp.sum((q / scale) ** 2)

    cfg = HMCConfig(num_samples=500, warmup=200, step_size=0.5, num_steps=10)
    samples, info = hmc_sample(potential, jnp.full((4,), 0.02), jax.random.key(0), cfg)
    s = np.asarray(samples)
    # chain moved off its init and matches the target scale within 2x
    assert float(np.abs(s[-100:]).mean()) < 10 * scale
    assert float(s[-100:].std()) > 0.3 * scale
    assert float(jnp.mean(info.accept_prob)) > 0.4


def test_map_warm_start_descends_potential():
    from robustbnns_tpu.inference.hmc import map_warm_start

    def potential(q, center):
        return 0.5 * jnp.sum((q - center) ** 2) * 1e4  # sharp

    center = jnp.full((6,), 3.0)
    q0 = jnp.zeros((6,))
    q_map, us = map_warm_start(potential, q0, data=(center,), steps=500, lr=0.05)
    assert float(us[-1]) < float(us[0]) * 1e-2
    np.testing.assert_allclose(np.asarray(q_map), 3.0, atol=0.1)


def test_bnn_hmc_map_init_improves_sharp_posterior():
    """With lots of data, MAP-init HMC reaches useful accuracy where the
    random-init chain (faithful reference behavior) may not."""
    from robustbnns_tpu.config import BNNConfig
    from robustbnns_tpu.data import load_dataset
    from robustbnns_tpu.models import BNN

    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "half_moons", n_inputs=4000
    )
    cfg = BNNConfig("half_moons", 16, "leaky", "fc", "hmc",
                    n_samples=20, warmup=30, step_size=0.001)
    bnn = BNN.from_config(cfg, inp_shape, out).train(
        x_train, y_train, batch_size=4000, hmc_mode="full", hmc_init="map",
        verbose=False,
    )
    acc = bnn.evaluate(x_test, y_test, n_samples=20, verbose=False)
    assert acc > 90.0


def test_hmc_chunked_dispatch_equivalent():
    """chunk_size bounds per-dispatch work (remote-backend robustness). The
    chunked driver follows the exact key stream of the monolithic scan;
    values may differ in the last float bits (XLA reassociation across the
    chunk boundary), so equality is asserted numerically over a short chain
    before chaotic amplification matters."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robustbnns_tpu.inference.hmc import HMCConfig, hmc_sample

    def potential(q):
        return 0.5 * jnp.sum(q * q)

    cfg = HMCConfig(num_samples=4, warmup=5, step_size=0.3)
    q0 = jnp.full((4,), 1.0)
    s_mono, i_mono = hmc_sample(potential, q0, jax.random.key(7), cfg)
    for chunk in (1, 3):
        s_chunk, i_chunk = hmc_sample(
            potential, q0, jax.random.key(7), cfg, chunk_size=chunk
        )
        np.testing.assert_allclose(
            np.asarray(s_mono), np.asarray(s_chunk), rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            float(i_mono.step_size), float(i_chunk.step_size), rtol=1e-3
        )


def test_mass_switch_degenerate_guard_and_reanchor():
    """A Welford window that never moved must fall back to unit mass (not the
    ~1e-4 regularization floor that froze TPU chains), and step-size
    adaptation must re-anchor under the new metric (round-3 fix)."""
    import jax

    from robustbnns_tpu.inference.hmc import _mass_switch

    d = 6
    pot = lambda q, *unused: 0.5 * jnp.sum(q * q)
    q = jnp.full((d,), 0.3)
    da = (jnp.log(1e-6), jnp.log(1e-6), jnp.zeros(()), jnp.log(1e-5))

    # Degenerate window: zero movement => m2 == 0.
    wf_frozen = (q, jnp.zeros((d,)), 50.0)
    da2, inv_mass = _mass_switch(pot, (), q, jax.random.key(0), da, wf_frozen, True)
    np.testing.assert_array_equal(np.asarray(inv_mass), np.ones(d))
    # Re-anchored step escaped the collapsed 1e-6 estimate.
    assert float(jnp.exp(da2[0])) > 1e-5
    assert float(da2[2]) == 0.0  # fresh dual-averaging state

    # Healthy window: variance flows through (with Stan shrinkage).
    m2 = jnp.full((d,), 2.0) * 49.0  # var = 2.0 over 50 draws
    da3, inv_mass2 = _mass_switch(
        pot, (), q, jax.random.key(0), da, (q, m2, 50.0), True
    )
    expected = (50.0 / 55.0) * 2.0 + (5.0 / 55.0) * 1e-3
    np.testing.assert_allclose(np.asarray(inv_mass2), expected, rtol=1e-5)


def test_warmup_dual_averaging_counter_continuous_across_window():
    """Stan keeps one continuous dual-averaging iteration counter across the
    init buffer and mass window, restarting only at the metric update — a
    phase-local reset would transiently snap log_eps back toward mu
    (ADVICE r3 #3). Checked via the it0 values the driver hands each chunk."""
    from robustbnns_tpu.inference.hmc import HMCConfig, run_windowed_warmup

    seen = []

    def warmup_chunk(carry, it0, n, welford_on):
        seen.append((int(it0), n, welford_on))
        return carry

    def mass_switch(q, k_ms, da, wf):
        seen.append("mass_switch")
        return da, jnp.ones_like(q)

    q = jnp.zeros((3,))
    da = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
    wf = (q, q, 0.0)
    carry0 = (q, jax.random.key(0), da, wf, jnp.ones((3,)))
    cfg = HMCConfig(num_samples=1, warmup=8, step_size=0.1)
    run_windowed_warmup(warmup_chunk, mass_switch, carry0, cfg, chunk_size=3)
    # phases: w1=2, w2=4, w3=2 — counter continuous 0..5 across A->B,
    # restarting at 0 only after the mass switch.
    assert seen == [
        (0, 2, False),          # phase A (it 0-1)
        (2, 3, True), (5, 1, True),  # phase B continues the counter (it 2-5)
        "mass_switch",
        (0, 2, False),          # phase C restarts with the fresh DA state
    ]


def test_windowed_warmup_phase_lengths():
    from robustbnns_tpu.inference.hmc import warmup_phase_lengths

    assert warmup_phase_lengths(100, True, True) == (25, 50, 25)
    assert warmup_phase_lengths(100, True, False) == (100, 0, 0)
    assert warmup_phase_lengths(100, False, True) == (50, 50, 0)
    assert warmup_phase_lengths(0, True, True) == (0, 0, 0)
    w1, w2, w3 = warmup_phase_lengths(7, True, True)
    assert (w1, w2, w3) == (1, 5, 1) and w1 + w2 + w3 == 7


def test_mcmc_defaults_high_precision():
    """TPU single-pass bf16 matmuls collapse adaptation on sharp posteriors
    (measured round 3), so the samplers must NEVER default to "default";
    the round-5 precision study validated "high" (bf16_3x) as mixing
    indistinguishably from full-f32 "highest" at 1.65x the throughput, so
    that is the default — overridable via ROBUSTBNNS_MCMC_PRECISION
    (read once at import; both configs must agree with it)."""
    import os

    from robustbnns_tpu.inference.hmc import MCMC_PRECISION_DEFAULT, HMCConfig
    from robustbnns_tpu.inference.nuts import NUTSConfig

    expected = os.environ.get("ROBUSTBNNS_MCMC_PRECISION", "high")
    assert MCMC_PRECISION_DEFAULT == expected
    assert MCMC_PRECISION_DEFAULT != "default"
    assert HMCConfig(num_samples=1, warmup=1).precision == MCMC_PRECISION_DEFAULT
    assert NUTSConfig(num_samples=1, warmup=1).precision == MCMC_PRECISION_DEFAULT


def test_mcmc_precision_env_validation():
    """A typo in ROBUSTBNNS_MCMC_PRECISION must fail loudly at import-time
    resolution, not silently pass an invalid string into XLA."""
    import os
    from unittest import mock

    import pytest

    from robustbnns_tpu.inference.hmc import _default_mcmc_precision

    with mock.patch.dict(os.environ, {"ROBUSTBNNS_MCMC_PRECISION": "f32"}):
        with pytest.raises(ValueError, match="ROBUSTBNNS_MCMC_PRECISION"):
            _default_mcmc_precision()
    for ok in ("default", "high", "highest"):
        with mock.patch.dict(os.environ, {"ROBUSTBNNS_MCMC_PRECISION": ok}):
            assert _default_mcmc_precision() == ok


def test_mcmc_heartbeat_emits_progress(monkeypatch, capsys):
    """ROBUSTBNNS_MCMC_HEARTBEAT=1 prints one synced stderr line per chunk so
    stall-guarded sweep runners (scripts/stall_guard.sh) can tell a healthy
    long cell from a wedged remote dispatch; off by default (and must not
    perturb the samples — same key stream, heartbeat is host-side only)."""
    from robustbnns_tpu.inference.hmc import HMCConfig, hmc_sample

    def potential(q):
        return 0.5 * jnp.sum(q * q)

    cfg = HMCConfig(num_samples=4, warmup=4, step_size=0.3)
    q0 = jnp.full((3,), 1.0)
    monkeypatch.delenv("ROBUSTBNNS_MCMC_HEARTBEAT", raising=False)
    s_off, _ = hmc_sample(potential, q0, jax.random.key(3), cfg, chunk_size=2)
    assert "[mcmc" not in capsys.readouterr().err
    monkeypatch.setenv("ROBUSTBNNS_MCMC_HEARTBEAT", "1")
    s_on, _ = hmc_sample(potential, q0, jax.random.key(3), cfg, chunk_size=2)
    err = capsys.readouterr().err
    assert err.count("warmup") >= 2 and err.count("hmc-sample") == 2
    np.testing.assert_array_equal(np.asarray(s_off), np.asarray(s_on))
