"""Fused sampled-dense Pallas kernel: ``y[s] = x @ (loc + softplus(rho)·eps_s) + b_s``.

The hot op of the SVI posterior predictive (and of Bayesian attacks, which call
the predictive 40×): S reparameterized weight draws of a dense layer, applied
to a batch. The XLA path materializes the ``(S, I, O)`` sampled-weight tensor
in HBM — for S=100 draws of a 784×512 layer that is ~160 MB written *and* read
back per forward. This kernel instead:

* generates the Gaussian noise ``eps_s`` **inside** the kernel with the TPU's
  native PRNG (``pltpu.prng_random_bits`` + Box-Muller), one ``(I, O_tile)``
  block at a time in VMEM — the sampled weights never touch HBM;
* orders the grid ``(O_tiles, S)`` with the sample index innermost, so the
  ``loc``/``rho`` blocks (indexed only by the O tile) stay resident in VMEM
  across all S draws — HBM traffic for the variational parameters is ``I·O``
  total, not ``S·I·O``;
* runs the per-draw contraction on the MXU via ``jnp.dot`` with
  ``preferred_element_type=float32``;
* draws the bias noise from an extra padded row of the same noise block.

Distribution note: the in-kernel PRNG stream is NOT bit-identical to
``jax.random.normal`` draws — same N(0,1) distribution, different stream.
Use the XLA path (``predict.svi_predict``) when bit-exact seeded parity with
the framework's seeds is required; this kernel is the throughput path.

A custom VJP differentiates through the fused op by regenerating the SAME
noise from the same per-(tile, sample) seeds: ``dx = Σ_s g_s W_sᵀ``,
``dloc = Σ_s xᵀ g_s``, ``drho = Σ_s (xᵀ g_s) ⊙ eps_s ⊙ σ(rho)`` — accumulated
tile-by-tile, again without materializing any ``(S, I, O)`` tensor. This makes
the kernel usable inside FGSM/PGD (grad wrt x) AND inside the ELBO (grad wrt
loc/rho).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _dot_precision():
    """MXU precision for the kernel's contractions.

    Mosaic lowers f32 ``jnp.dot`` through bf16 passes by default, which makes
    the custom VJP an inexact adjoint of the forward (measured on hardware:
    zero-scale dloc off by ~1%, finite-difference checks off by ~14% at small
    shapes — present since round 1, invisible to the CPU interpreter).
    HIGHEST restores exact-f32 contractions (dloc error 2e-6, FD 0.02%).
    ``ROBUSTBNNS_KERNEL_PRECISION=default`` opts back into the fast path for
    throughput experiments.
    """
    import os

    if os.environ.get("ROBUSTBNNS_KERNEL_PRECISION") == "default":
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=_dot_precision()
    )


def _normal_from_bits(shape):
    """Box-Muller N(0,1) from the on-chip PRNG. Call ``pltpu.prng_seed`` first.

    The raw bits may surface as signed int32 on hardware; build the uniform by
    splicing the top 23 bits into a [1, 2) float mantissa (exact, sign-safe)
    instead of an integer→float convert. ``u1 = 2 - f1 ∈ (1, 2]`` keeps the log
    argument strictly positive.

    Uses the FULL Box-Muller pair — ``(r·cosθ, r·sinθ)`` are iid N(0,1) — so
    each uniform pair yields TWO normals: half the PRNG calls and half the
    log/sqrt work per normal vs the cos-only variant (noise generation is
    the measured bottleneck of this kernel at production sizes,
    PERFORMANCE.md "Fused Pallas kernel").
    """
    rows, cols = shape
    half = -(-((rows + 1) // 2) // 8) * 8  # sublane-aligned (f32 tile is 8x128)
    b1 = pltpu.bitcast(pltpu.prng_random_bits((half, cols)), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits((half, cols)), jnp.uint32)
    f1 = pltpu.bitcast((b1 >> 9) | jnp.uint32(0x3F800000), jnp.float32)  # [1,2)
    f2 = pltpu.bitcast((b2 >> 9) | jnp.uint32(0x3F800000), jnp.float32)  # [1,2)
    u1 = 2.0 - f1  # (0, 1] — log-safe
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * (f2 - 1.0)
    z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=0)
    return z if 2 * half == rows else z[:rows]


def _softplus(x):
    return jax.nn.softplus(x)


def _fwd_kernel(seed_ref, x_ref, loc_ref, rho_ref, bloc_ref, brho_ref, out_ref):
    o = pl.program_id(0)
    s = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + s * pl.num_programs(0) + o)

    i_dim = loc_ref.shape[0]
    o_t = loc_ref.shape[1]
    eps = _normal_from_bits((i_dim + 8, o_t))
    w = loc_ref[:] + _softplus(rho_ref[:]) * eps[:i_dim]
    b = bloc_ref[0, :] + _softplus(brho_ref[0, :]) * eps[i_dim]

    y = _dot(x_ref[:], w)
    out_ref[0, :, :] = y + b[None, :]


def _bwd_dx_kernel(seed_ref, g_ref, loc_ref, rho_ref, dx_ref):
    """``dx = Σ_{o,s} g[s,:,o·t:] @ W_{s,o}ᵀ``. The dx block is the whole output
    (constant index across the grid), so += accumulation over both axes is
    sound. Split from the parameter pass so attack gradients (which only need
    dx) let XLA dead-code-eliminate the other pallas_call entirely — the
    fused attack backward then does one matmul + one noise regeneration per
    tile instead of three matmuls + elementwise cotangent math."""
    o = pl.program_id(0)
    s = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + s * pl.num_programs(0) + o)

    i_dim = loc_ref.shape[0]
    o_t = loc_ref.shape[1]
    eps = _normal_from_bits((i_dim + 8, o_t))
    w = loc_ref[:] + _softplus(rho_ref[:]) * eps[:i_dim]

    @pl.when(jnp.logical_and(o == 0, s == 0))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    dx_ref[:] += _dot(g_ref[0, :, :], w.T)


def _bwd_dparams_kernel(
    seed_ref, g_ref, x_ref, rho_ref, brho_ref,
    dloc_ref, drho_ref, dbloc_ref, dbrho_ref,
):
    """Parameter cotangents. Grid (o, s): each dloc/drho block is constant
    across the inner s sweep, so += accumulation over samples is sound."""
    o = pl.program_id(0)
    s = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + s * pl.num_programs(0) + o)

    i_dim = rho_ref.shape[0]
    o_t = rho_ref.shape[1]
    eps = _normal_from_bits((i_dim + 8, o_t))
    w_eps = eps[:i_dim]
    b_eps = eps[i_dim]

    g = g_ref[0, :, :]  # (B, O_t)
    dW = _dot(x_ref[:].T, g)
    db = jnp.sum(g, axis=0)

    @pl.when(s == 0)
    def _():
        dloc_ref[:] = jnp.zeros_like(dloc_ref)
        drho_ref[:] = jnp.zeros_like(drho_ref)
        dbloc_ref[:] = jnp.zeros_like(dbloc_ref)
        dbrho_ref[:] = jnp.zeros_like(dbrho_ref)

    dloc_ref[:] += dW
    drho_ref[:] += dW * w_eps * jax.nn.sigmoid(rho_ref[:])
    dbloc_ref[0, :] += db
    dbrho_ref[0, :] += db * b_eps * jax.nn.sigmoid(brho_ref[0, :])


def _pick_o_tile(o_dim: int) -> int:
    for t in (256, 128):
        if o_dim % t == 0:
            return t
    return o_dim


def _interpret():
    """Run the kernel in TPU-interpret mode off-TPU (tests on the CPU mesh).

    Plain ``interpret=True`` lacks lowerings for TPU-only primitives
    (``prng_seed`` etc.); ``pltpu.InterpretParams`` emulates them.
    """
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams()


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def sampled_dense(x, loc, rho, bloc, brho, n_samples: int, seed=0):
    """``(S, B, O)`` outputs of S sampled dense layers (see module docstring).

    ``x``: (B, I); ``loc``/``rho``: (I, O); ``bloc``/``brho``: (O,).
    ``n_samples`` is static; ``seed`` may be a Python int or a traced int32
    scalar (so attack loops can vary the draws per scan iteration).
    """
    return _sampled_dense_fwd_impl(x, loc, rho, bloc, brho, n_samples, seed)


def _sampled_dense_fwd_impl(x, loc, rho, bloc, brho, n_samples, seed):
    b_dim, i_dim = x.shape
    o_dim = loc.shape[1]
    o_t = _pick_o_tile(o_dim)
    num_o = o_dim // o_t

    grid = (num_o, n_samples)
    out = pl.pallas_call(
        _fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_dim, i_dim), lambda o, s, *_: (0, 0)),
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((1, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((1, o_t), lambda o, s, *_: (0, o)),
            ],
            out_specs=pl.BlockSpec((1, b_dim, o_t), lambda o, s, *_: (s, 0, o)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_samples, b_dim, o_dim), jnp.float32),
        # NOTE: keep the default ("arbitrary") dimension semantics — marking
        # the grid "parallel" lets Mosaic reorder iterations, which defeats
        # the loc/rho VMEM residency across the inner s sweep and re-fetches
        # the variational parameters per draw (measured: 4.2 ms → 16.1 ms).
        interpret=_interpret(),
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        x.astype(jnp.float32),
        loc.astype(jnp.float32),
        rho.astype(jnp.float32),
        bloc.reshape(1, -1).astype(jnp.float32),
        brho.reshape(1, -1).astype(jnp.float32),
    )
    return out


def _sampled_dense_fwd(x, loc, rho, bloc, brho, n_samples, seed):
    out = _sampled_dense_fwd_impl(x, loc, rho, bloc, brho, n_samples, seed)
    return out, (x, loc, rho, brho, seed)


def _sampled_dense_bwd(n_samples, residuals, g):
    x, loc, rho, brho, seed = residuals
    b_dim, i_dim = x.shape
    o_dim = loc.shape[1]
    o_t = _pick_o_tile(o_dim)
    num_o = o_dim // o_t
    grid = (num_o, n_samples)

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    # Two pallas_calls (not one fused kernel): each is pure, so when the
    # caller only consumes dx — every attack gradient — XLA dead-code
    # eliminates the parameter pass, and vice versa for the ELBO's dloc/drho.
    dx = pl.pallas_call(
        _bwd_dx_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, b_dim, o_t), lambda o, s, *_: (s, 0, o)),
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
            ],
            out_specs=pl.BlockSpec((b_dim, i_dim), lambda o, s, *_: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b_dim, i_dim), jnp.float32),
        interpret=_interpret(),
    )(
        seed_arr,
        g.astype(jnp.float32),
        loc.astype(jnp.float32),
        rho.astype(jnp.float32),
    )

    dloc, drho, dbloc, dbrho = pl.pallas_call(
        _bwd_dparams_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, b_dim, o_t), lambda o, s, *_: (s, 0, o)),
                pl.BlockSpec((b_dim, i_dim), lambda o, s, *_: (0, 0)),
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((1, o_t), lambda o, s, *_: (0, o)),
            ],
            out_specs=[
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((1, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((1, o_t), lambda o, s, *_: (0, o)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((i_dim, o_dim), jnp.float32),
            jax.ShapeDtypeStruct((i_dim, o_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, o_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, o_dim), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        seed_arr,
        g.astype(jnp.float32),
        x.astype(jnp.float32),
        rho.astype(jnp.float32),
        brho.reshape(1, -1).astype(jnp.float32),
    )
    return dx, dloc, drho, dbloc.reshape(-1), dbrho.reshape(-1), _seed_zero(seed)


def _seed_zero(seed):
    """Symbolic-zero cotangent for the (integer) seed argument."""
    import numpy as _np

    if isinstance(seed, (int, _np.integer)):
        return _np.zeros((), jax.dtypes.float0)
    return _np.zeros(jnp.shape(seed), jax.dtypes.float0)


sampled_dense.defvjp(_sampled_dense_fwd, _sampled_dense_bwd)


def sampled_dense_reference(x, loc, rho, bloc, brho, n_samples, key):
    """Pure-XLA reference of the same op (distributionally equal noise).

    Uses ``jax.random.normal`` draws — NOT the kernel's bit stream — so tests
    compare statistics (means/variances across samples), plus exact values in
    the zero-scale limit where the noise cancels.
    """
    keys = jax.random.split(key, n_samples)

    def one(k):
        kw, kb = jax.random.split(k)
        w = loc + jax.nn.softplus(rho) * jax.random.normal(kw, loc.shape)
        b = bloc + jax.nn.softplus(brho) * jax.random.normal(kb, bloc.shape)
        return x @ w + b

    return jax.vmap(one)(keys)


# --------------------------------------------------------------------------- #
# Per-sample-input variant: xs has a leading sample axis (hidden layers of a
# fused multi-layer predictive — each draw sees its own activations).
# --------------------------------------------------------------------------- #


def _fwd_kernel_xs(seed_ref, x_ref, loc_ref, rho_ref, bloc_ref, brho_ref, out_ref):
    o = pl.program_id(0)
    s = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + s * pl.num_programs(0) + o)

    i_dim = loc_ref.shape[0]
    o_t = loc_ref.shape[1]
    eps = _normal_from_bits((i_dim + 8, o_t))
    w = loc_ref[:] + _softplus(rho_ref[:]) * eps[:i_dim]
    b = bloc_ref[0, :] + _softplus(brho_ref[0, :]) * eps[i_dim]

    y = _dot(x_ref[0], w)
    out_ref[0, :, :] = y + b[None, :]


def _bwd_xs_dx_kernel(seed_ref, g_ref, loc_ref, rho_ref, dx_ref):
    """dxs[s] = g[s] @ W_s^T. Grid (s, o): the dxs block is constant across the
    inner o sweep, so += accumulation over o tiles is sound (Pallas output
    blocks must not be revisited after their index changes)."""
    s = pl.program_id(0)
    o = pl.program_id(1)
    num_o = pl.num_programs(1)
    pltpu.prng_seed(seed_ref[0] + s * num_o + o)

    i_dim = loc_ref.shape[0]
    o_t = loc_ref.shape[1]
    eps = _normal_from_bits((i_dim + 8, o_t))
    w = loc_ref[:] + _softplus(rho_ref[:]) * eps[:i_dim]

    @pl.when(o == 0)
    def _():
        dx_ref[0] = jnp.zeros_like(dx_ref[0])

    dx_ref[0] += _dot(g_ref[0], w.T)


def _bwd_xs_dparams_kernel(
    seed_ref, g_ref, x_ref, rho_ref, brho_ref,
    dloc_ref, drho_ref, dbloc_ref, dbrho_ref,
):
    """Parameter cotangents. Grid (o, s): each dloc/drho block is constant
    across the inner s sweep, so += accumulation over samples is sound."""
    o = pl.program_id(0)
    s = pl.program_id(1)
    num_o = pl.num_programs(0)
    pltpu.prng_seed(seed_ref[0] + s * num_o + o)

    i_dim = rho_ref.shape[0]
    o_t = rho_ref.shape[1]
    eps = _normal_from_bits((i_dim + 8, o_t))
    w_eps = eps[:i_dim]
    b_eps = eps[i_dim]

    g = g_ref[0]
    dW = _dot(x_ref[0].T, g)
    db = jnp.sum(g, axis=0)

    @pl.when(s == 0)
    def _():
        dloc_ref[:] = jnp.zeros_like(dloc_ref)
        drho_ref[:] = jnp.zeros_like(drho_ref)
        dbloc_ref[:] = jnp.zeros_like(dbloc_ref)
        dbrho_ref[:] = jnp.zeros_like(dbrho_ref)

    dloc_ref[:] += dW
    drho_ref[:] += dW * w_eps * jax.nn.sigmoid(rho_ref[:])
    dbloc_ref[0, :] += db
    dbrho_ref[0, :] += db * b_eps * jax.nn.sigmoid(brho_ref[0, :])


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def sampled_dense_xs(xs, loc, rho, bloc, brho, n_samples: int, seed=0):
    """Per-sample-input sampled dense: ``y[s] = xs[s] @ W_s + b_s``.

    ``xs``: (S, B, I). Same fused-noise design as :func:`sampled_dense`.
    """
    return _sampled_dense_xs_fwd_impl(xs, loc, rho, bloc, brho, n_samples, seed)


def _sampled_dense_xs_fwd_impl(xs, loc, rho, bloc, brho, n_samples, seed):
    s_dim, b_dim, i_dim = xs.shape
    assert s_dim == n_samples
    o_dim = loc.shape[1]
    o_t = _pick_o_tile(o_dim)
    num_o = o_dim // o_t

    return pl.pallas_call(
        _fwd_kernel_xs,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_o, n_samples),
            in_specs=[
                pl.BlockSpec((1, b_dim, i_dim), lambda o, s, *_: (s, 0, 0)),
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((1, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((1, o_t), lambda o, s, *_: (0, o)),
            ],
            out_specs=pl.BlockSpec((1, b_dim, o_t), lambda o, s, *_: (s, 0, o)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_samples, b_dim, o_dim), jnp.float32),
        interpret=_interpret(),
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        xs.astype(jnp.float32),
        loc.astype(jnp.float32),
        rho.astype(jnp.float32),
        bloc.reshape(1, -1).astype(jnp.float32),
        brho.reshape(1, -1).astype(jnp.float32),
    )


def _sampled_dense_xs_fwd(xs, loc, rho, bloc, brho, n_samples, seed):
    out = _sampled_dense_xs_fwd_impl(xs, loc, rho, bloc, brho, n_samples, seed)
    return out, (xs, loc, rho, brho, seed)


def _sampled_dense_xs_bwd(n_samples, residuals, g):
    xs, loc, rho, brho, seed = residuals
    s_dim, b_dim, i_dim = xs.shape
    o_dim = loc.shape[1]
    o_t = _pick_o_tile(o_dim)
    num_o = o_dim // o_t
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    # Pass 1: dxs (grid s-major so each dxs block accumulates consecutively).
    dxs = pl.pallas_call(
        _bwd_xs_dx_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_samples, num_o),
            in_specs=[
                pl.BlockSpec((1, b_dim, o_t), lambda s, o, *_: (s, 0, o)),
                pl.BlockSpec((i_dim, o_t), lambda s, o, *_: (0, o)),
                pl.BlockSpec((i_dim, o_t), lambda s, o, *_: (0, o)),
            ],
            out_specs=pl.BlockSpec((1, b_dim, i_dim), lambda s, o, *_: (s, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_samples, b_dim, i_dim), jnp.float32),
        interpret=_interpret(),
    )(seed_arr, g.astype(jnp.float32), loc.astype(jnp.float32), rho.astype(jnp.float32))

    # Pass 2: parameter cotangents (grid o-major so they accumulate over s).
    dloc, drho, dbloc, dbrho = pl.pallas_call(
        _bwd_xs_dparams_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_o, n_samples),
            in_specs=[
                pl.BlockSpec((1, b_dim, o_t), lambda o, s, *_: (s, 0, o)),
                pl.BlockSpec((1, b_dim, i_dim), lambda o, s, *_: (s, 0, 0)),
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((1, o_t), lambda o, s, *_: (0, o)),
            ],
            out_specs=[
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((i_dim, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((1, o_t), lambda o, s, *_: (0, o)),
                pl.BlockSpec((1, o_t), lambda o, s, *_: (0, o)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((i_dim, o_dim), jnp.float32),
            jax.ShapeDtypeStruct((i_dim, o_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, o_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, o_dim), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        seed_arr,
        g.astype(jnp.float32),
        xs.astype(jnp.float32),
        rho.astype(jnp.float32),
        brho.reshape(1, -1).astype(jnp.float32),
    )
    return dxs, dloc, drho, dbloc.reshape(-1), dbrho.reshape(-1), _seed_zero(seed)


sampled_dense_xs.defvjp(_sampled_dense_xs_fwd, _sampled_dense_xs_bwd)
