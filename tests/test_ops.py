"""Pallas sampled-dense kernel tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustbnns_tpu.ops import sampled_dense, sampled_dense_reference


@pytest.fixture
def layer():
    key = jax.random.key(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    b_dim, i_dim, o_dim = 16, 32, 128
    x = jax.random.normal(k1, (b_dim, i_dim))
    loc = jax.random.normal(k2, (i_dim, o_dim)) * 0.1
    rho = jax.random.normal(k3, (i_dim, o_dim)) - 1.0
    bloc = jax.random.normal(k4, (o_dim,)) * 0.1
    brho = jax.random.normal(k5, (o_dim,)) - 1.0
    return x, loc, rho, bloc, brho


def test_zero_scale_limit_is_exact(layer):
    """With rho → -inf (scale → 0) the op is a plain dense layer.

    References here (and in the VJP tests below) are computed in host numpy —
    exact f32, matching the kernel's HIGHEST-precision MXU contractions. On
    TPU an XLA-default reference (`x @ loc`) is the *less* precise side (bf16
    passes) and would fail the tolerance against the exact kernel.
    """
    x, loc, _, bloc, _ = layer
    neg = jnp.full_like(loc, -30.0)
    negb = jnp.full((loc.shape[1],), -30.0)
    out = sampled_dense(x, loc, neg, bloc, negb, 4, 0)
    expected = np.asarray(x) @ np.asarray(loc) + np.asarray(bloc)
    assert out.shape == (4, 16, 128)
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(out[s]), np.asarray(expected), atol=1e-4
        )


def test_noise_statistics_match_reference(layer):
    """Across many samples, aggregate moments match the XLA reference path.

    Per-entry comparisons are too noisy at S=256; compare the global mean and
    the mean per-entry std (the noise level), which concentrate well.
    """
    if jax.default_backend() != "tpu":
        pytest.skip(
            "CPU interpret mode emulates prng_seed with a fixed stream — "
            "noise statistics are only real on TPU (validated there)"
        )
    x, loc, rho, bloc, brho = layer
    S = 256
    out = sampled_dense(x, loc, rho, bloc, brho, S, 123)
    ref = sampled_dense_reference(x, loc, rho, bloc, brho, S, jax.random.key(9))
    assert float(out.mean()) == pytest.approx(float(ref.mean()), abs=0.05)
    assert float(out.std(0).mean()) == pytest.approx(
        float(ref.std(0).mean()), rel=0.05
    )


def test_same_seed_reproducible_and_samples_distinct(layer):
    """Same call → same draws; distinct samples within a call.

    NOTE: seed *sensitivity* (different seed → different stream) is a TPU-only
    property — the CPU interpreter emulates ``prng_seed`` with a fixed stream —
    so it is asserted only when running on real TPU hardware.
    """
    x, loc, rho, bloc, brho = layer
    o1 = sampled_dense(x, loc, rho, bloc, brho, 3, 7)
    o2 = sampled_dense(x, loc, rho, bloc, brho, 3, 7)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    if jax.default_backend() == "tpu":
        assert not np.array_equal(np.asarray(o1[0]), np.asarray(o1[1]))
        o3 = sampled_dense(x, loc, rho, bloc, brho, 3, 8)
        assert not np.array_equal(np.asarray(o1), np.asarray(o3))


def test_custom_vjp_grad_x_matches_regenerated_weights(layer):
    """∇ₓ through the kernel equals Σ_s g W_sᵀ with the SAME regenerated noise.

    Verified indirectly: in the zero-scale limit the weights are deterministic
    and the gradient must match the plain dense-layer gradient exactly.
    """
    x, loc, _, bloc, _ = layer
    neg = jnp.full_like(loc, -30.0)
    negb = jnp.full((loc.shape[1],), -30.0)

    def f(x):
        return jnp.sum(sampled_dense(x, loc, neg, bloc, negb, 3, 0) ** 2)

    def f_ref(x):
        # precision='highest': match the kernel's exact-f32 contractions
        y = jnp.dot(x, loc, precision="highest") + bloc
        return 3 * jnp.sum(y**2)

    gx = jax.grad(f)(x)
    gx_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-3, atol=1e-3)


def test_custom_vjp_param_grads_zero_scale(layer):
    """dloc in the zero-scale limit matches the plain dense layer's dW."""
    x, loc, _, bloc, _ = layer
    neg = jnp.full_like(loc, -30.0)
    negb = jnp.full((loc.shape[1],), -30.0)

    def f(loc, bloc):
        return jnp.sum(sampled_dense(x, loc, neg, bloc, negb, 2, 0))

    dloc, dbloc = jax.grad(f, argnums=(0, 1))(loc, bloc)
    # d/dloc sum_s sum(x@loc + b) = S * x^T @ ones
    expected_dloc = 2 * np.asarray(x).T @ np.ones((16, 128), np.float32)
    np.testing.assert_allclose(np.asarray(dloc), expected_dloc, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(dbloc), np.full(128, 2 * 16.0), rtol=1e-4
    )


def test_grad_consistency_fwd_bwd_same_noise(layer):
    """Finite-difference check wrt x WITH noise: the bwd kernel must regenerate
    exactly the fwd kernel's noise (else the directional derivative is wrong)."""
    x, loc, rho, bloc, brho = layer

    def f(x):
        return jnp.sum(sampled_dense(x, loc, rho, bloc, brho, 2, 5) ** 2)

    g = jax.grad(f)(x)
    v = jax.random.normal(jax.random.key(99), x.shape)
    eps = 1e-3
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    analytic = jnp.sum(g * v)
    assert float(jnp.abs(fd - analytic)) / (abs(float(fd)) + 1e-6) < 2e-2


# --------------------------------------------------------------------------- #
# per-sample-x variant + fused multi-layer predictive
# --------------------------------------------------------------------------- #


def test_xs_variant_zero_scale_exact(layer):
    from robustbnns_tpu.ops import sampled_dense_xs

    x, loc, _, bloc, _ = layer
    neg = jnp.full_like(loc, -30.0)
    negb = jnp.full((loc.shape[1],), -30.0)
    xs = jnp.stack([x, x * 2.0, x * 3.0])
    out = sampled_dense_xs(xs, loc, neg, bloc, negb, 3, 0)
    for s, scale in enumerate([1.0, 2.0, 3.0]):
        expected = scale * (np.asarray(x) @ np.asarray(loc)) + np.asarray(bloc)
        np.testing.assert_allclose(np.asarray(out[s]), expected, atol=1e-3)


def test_xs_variant_vjp_zero_scale(layer):
    from robustbnns_tpu.ops import sampled_dense_xs

    x, loc, _, bloc, _ = layer
    neg = jnp.full_like(loc, -30.0)
    negb = jnp.full((loc.shape[1],), -30.0)
    xs = jnp.stack([x, x])

    def f(xs):
        return jnp.sum(sampled_dense_xs(xs, loc, neg, bloc, negb, 2, 0) ** 2)

    def f_ref(xs):
        return jnp.sum(
            (jnp.einsum("sbi,io->sbo", xs, loc, precision="highest") + bloc)
            ** 2
        )

    g = jax.grad(f)(xs)
    g_ref = jax.grad(f_ref)(xs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-3)


def test_xs_variant_fd_with_noise(layer):
    from robustbnns_tpu.ops import sampled_dense_xs

    x, loc, rho, bloc, brho = layer
    xs = jnp.stack([x, x * 0.5])

    def f(xs):
        return jnp.sum(sampled_dense_xs(xs, loc, rho, bloc, brho, 2, 3) ** 2)

    g = jax.grad(f)(xs)
    v = jax.random.normal(jax.random.key(4), xs.shape)
    eps = 1e-3
    fd = (f(xs + eps * v) - f(xs - eps * v)) / (2 * eps)
    an = jnp.sum(g * v)
    assert float(jnp.abs(fd - an)) / (abs(float(fd)) + 1e-6) < 2e-2


def test_fused_predict_matches_xla_in_zero_scale_limit():
    """With scale→0 the fused predictive must equal the deterministic net."""
    from robustbnns_tpu.inference.svi import MeanFieldPosterior
    from robustbnns_tpu.models import build_architecture
    from robustbnns_tpu.ops import svi_predict_fused

    arch = build_architecture("fc2", "leaky", (16, 16, 1), 10, 32)
    params = arch.init(jax.random.key(0))
    neg = jax.tree_util.tree_map(lambda p: jnp.full_like(p, -30.0), params)
    posterior = MeanFieldPosterior(loc=params, rho=neg)

    x = jax.random.uniform(jax.random.key(1), (8, 16, 16, 1))
    probs = svi_predict_fused(arch, posterior, x, n_samples=4, seed=0)
    expected = jax.nn.softmax(arch.apply(params, x), axis=-1)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(expected), atol=1e-4)


def test_fused_predict_rejects_conv():
    from robustbnns_tpu.inference.svi import init_meanfield
    from robustbnns_tpu.models import build_architecture
    from robustbnns_tpu.ops import svi_predict_fused

    arch = build_architecture("conv", "leaky", (28, 28, 1), 10, 32, "mnist")
    post = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))
    with pytest.raises(NotImplementedError, match="fc/fc2"):
        svi_predict_fused(arch, post, jnp.zeros((2, 28, 28, 1)), 2)


def test_fused_predictive_fn_in_attack():
    """The fused closure drives FGSM end-to-end (traced per-iteration seeds)."""
    from robustbnns_tpu.attacks import fgsm_attack
    from robustbnns_tpu.inference.svi import init_meanfield
    from robustbnns_tpu.models import build_architecture
    from robustbnns_tpu.ops import fused_predictive_fn

    arch = build_architecture("fc", "leaky", (1, 2, 1), 2, 16)
    post = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))
    # widen I=2 is below tile alignment; fused kernel still runs in interpret
    # mode (hardware alignment is a TPU-perf concern, not correctness here).
    fn = fused_predictive_fn(arch, post, n_samples=3)
    x = jax.random.uniform(jax.random.key(2), (8, 1, 2, 1))
    y = jnp.zeros((8,), jnp.int32)
    x_adv = fgsm_attack(fn, x, y, epsilon=0.2, key=jax.random.key(3))
    assert x_adv.shape == x.shape
    assert float(jnp.max(jnp.abs(x_adv - x))) <= 0.2 + 1e-6
