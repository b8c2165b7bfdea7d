"""The four reference architectures as pure ``init``/``apply`` functions.

Reference ``model_nn.py:60-124`` builds torch ``nn.Sequential`` models:

* ``fc``   — Flatten → Linear(in, h) → act → Linear(h, out)            (``:77-82``)
* ``fc2``  — Flatten → Linear(in, h) → act → Linear(h, h) → act →
             Linear(h, out)                                            (``:84-91``)
* ``conv`` — Conv(C→32, k5, valid) → act → MaxPool(2) →
             Conv(32→h, k5, valid) → act → MaxPool(2, stride 1) →
             Flatten → Linear(h/16·input_size, out)                    (``:93-106``)
             (mnist/fashion only, ``:95``; the h/16·input_size flatten
             dimension encodes the 4×4 spatial pooling of a 28×28 input:
             28→24→12→8→7, and 7·7·h == h/16·784)
* ``conv2``— same trunk, lazily-shaped output Linear                   (``:108-121``)

Reference quirk reproduced *fixed*: ``conv2``'s head is
``lambda x: nn.Linear(x.size(1), out)(x)`` (``model_nn.py:121``) — a **fresh
randomly-initialized** Linear on every forward call, never trained or saved.
Here ``conv2`` gets a real output layer with shape inferred at build time; the
reference behavior is unusable for inference parity and is documented as a bug.

TPU-first design decisions:

* arrays flow **NHWC**; convolutions use ``lax.conv_general_dilated`` with
  ``('NHWC', 'HWIO', 'NHWC')`` so XLA tiles them onto the MXU without layout
  transposes;
* parameters are a flat tuple of ``{'w','b'}`` dicts — a pytree that vmaps over
  a leading sample/member axis for BNN posteriors and ensembles;
* initialization matches torch's ``nn.Linear``/``nn.Conv2d`` default
  (``U(-1/sqrt(fan_in), +1/sqrt(fan_in))`` for both weights and biases), so
  deterministic training statistically matches the reference;
* hidden sizes must be powers of two ≥ 16 (reference ``model_nn.py:39-40``) —
  conveniently also what the 128-lane MXU wants.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Tuple[dict, ...]

ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": jax.nn.relu,
    # torch nn.LeakyReLU default negative_slope=0.01
    "leaky": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "sigm": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


class Architecture(NamedTuple):
    """A pure-function network: ``params = init(key)``, ``logits = apply(params, x)``.

    ``apply`` takes NHWC inputs of shape ``(batch,) + input_shape`` and returns
    ``(batch, output_size)`` raw logits. Both are jittable and vmappable over a
    leading axis of ``params`` (posterior samples, ensemble members).
    """

    init: Callable[[jax.Array], Params]
    apply: Callable[[Params, jax.Array], jax.Array]
    name: str
    input_shape: tuple  # NHWC, without batch dim
    output_size: int
    hidden_size: int
    activation: str


def _uniform_fan_in(key, shape, fan_in, dtype=jnp.float32):
    """torch default init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _dense_init(key, in_dim, out_dim):
    kw, kb = jax.random.split(key)
    return {
        "w": _uniform_fan_in(kw, (in_dim, out_dim), in_dim),
        "b": _uniform_fan_in(kb, (out_dim,), in_dim),
    }


def _conv_init(key, k, in_ch, out_ch):
    kw, kb = jax.random.split(key)
    fan_in = in_ch * k * k
    return {
        "w": _uniform_fan_in(kw, (k, k, in_ch, out_ch), fan_in),  # HWIO
        "b": _uniform_fan_in(kb, (out_ch,), fan_in),
    }


def _conv2d_valid(x, w, b):
    """5×5 VALID convolution, NHWC/HWIO — MXU-mapped by XLA.

    Honors the ``ROBUSTBNNS_BF16`` fast path like the dense layers: bf16
    operands, float32 accumulation.
    """
    dt = _matmul_dtype()
    if dt is not None:
        # Fully-bf16 conv (output included) so the transposed conv in the
        # backward pass sees matching dtypes; upcast after. MXU still
        # accumulates in f32 internally.
        y = lax.conv_general_dilated(
            x.astype(dt),
            w.astype(dt),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y.astype(jnp.float32) + b
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return y + b


def _maxpool(x, window, stride):
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def _normalize_input_shape(input_shape: Sequence[int]) -> tuple:
    """Accept reference-style NCHW shapes and return NHWC.

    The reference passes ``input_shape`` as CHW (e.g. ``(1, 28, 28)``) from its
    channels-first loaders; our loaders produce HWC. Disambiguate by treating a
    leading dim in {1, 3} with a non-channel trailing dim as CHW.
    """
    s = tuple(int(d) for d in input_shape)
    if len(s) != 3:
        raise ValueError(f"input_shape must be rank 3, got {s}")
    if s[0] in (1, 3) and s[2] not in (1, 3):
        return (s[1], s[2], s[0])  # CHW -> HWC
    return s


def _matmul_dtype() -> object:
    """Opt-in bf16 matmuls (``ROBUSTBNNS_BF16=1``).

    Casts matmul OPERANDS to bfloat16 with float32 accumulation — the MXU's
    native fast path. Measured on v5e (fc2-512, S=100, B=128 predictive):
    input-gradient pass 6.39 → 4.16 ms (1.54×), forward ≈ unchanged
    (noise-generation-bound). Parameters stay float32; only the compute is
    reduced precision, so training remains numerically f32-dominated.
    Default off to keep bit-exact f32 parity.
    """
    import os

    return jnp.bfloat16 if os.environ.get("ROBUSTBNNS_BF16") == "1" else None


def _dense(x, p):
    """x @ w + b with the optional bf16-MXU fast path."""
    dt = _matmul_dtype()
    if dt is None:
        return x @ p["w"] + p["b"]
    return (
        jnp.dot(x.astype(dt), p["w"].astype(dt), preferred_element_type=jnp.float32)
        + p["b"]
    )


def build_architecture(
    architecture: str,
    activation: str,
    input_shape: Sequence[int],
    output_size: int,
    hidden_size: int,
    dataset_name: str = "",
) -> Architecture:
    """Build one of the four reference architectures.

    Raises on non-power-of-two or <16 hidden sizes (reference
    ``model_nn.py:39-40``) and on ``conv`` with non-MNIST-shaped datasets
    (reference ``model_nn.py:95``).
    """
    if hidden_size < 16 or (hidden_size & (hidden_size - 1)) != 0:
        raise ValueError("hidden size should be a power of 2, greater than 16.")
    if activation not in ACTIVATIONS:
        raise ValueError(f"Wrong activation name {activation!r}.")

    hwc = _normalize_input_shape(input_shape)
    h_in, w_in, c_in = hwc
    input_size = h_in * w_in * c_in
    act = ACTIVATIONS[activation]

    if architecture == "fc":
        dims = [(input_size, hidden_size), (hidden_size, output_size)]

        def init(key):
            keys = jax.random.split(key, len(dims))
            return tuple(_dense_init(k, i, o) for k, (i, o) in zip(keys, dims))

        def apply(params, x):
            x = x.reshape(x.shape[0], -1)
            x = act(_dense(x, params[0]))
            return _dense(x, params[1])

    elif architecture == "fc2":
        dims = [
            (input_size, hidden_size),
            (hidden_size, hidden_size),
            (hidden_size, output_size),
        ]

        def init(key):
            keys = jax.random.split(key, len(dims))
            return tuple(_dense_init(k, i, o) for k, (i, o) in zip(keys, dims))

        def apply(params, x):
            x = x.reshape(x.shape[0], -1)
            x = act(_dense(x, params[0]))
            x = act(_dense(x, params[1]))
            return _dense(x, params[2])

    elif architecture in ("conv", "conv2"):
        if architecture == "conv" and dataset_name not in ("mnist", "fashion_mnist"):
            raise NotImplementedError(
                "conv supports mnist/fashion_mnist only (reference model_nn.py:95)"
            )

        # Trace spatial dims through the trunk: conv5 VALID → pool2/2 →
        # conv5 VALID → pool2/1.
        h1, w1 = h_in - 4, w_in - 4
        h2, w2 = h1 // 2, w1 // 2
        h3, w3 = h2 - 4, w2 - 4
        h4, w4 = h3 - 1, w3 - 1
        flat_dim = h4 * w4 * hidden_size
        if architecture == "conv":
            # Reference head dimension: (hidden/16)·input_size (model_nn.py:106).
            ref_dim = (hidden_size // 16) * input_size
            if ref_dim != flat_dim:
                raise ValueError(
                    f"conv flatten mismatch: reference head expects {ref_dim}, "
                    f"trunk produces {flat_dim} (input {hwc})"
                )

        def init(key):
            k1, k2, k3 = jax.random.split(key, 3)
            return (
                _conv_init(k1, 5, c_in, 32),
                _conv_init(k2, 5, 32, hidden_size),
                _dense_init(k3, flat_dim, output_size),
            )

        def apply(params, x):
            x = _conv2d_valid(x, params[0]["w"], params[0]["b"])
            x = act(x)
            x = _maxpool(x, 2, 2)
            x = _conv2d_valid(x, params[1]["w"], params[1]["b"])
            x = act(x)
            x = _maxpool(x, 2, 1)
            x = x.reshape(x.shape[0], -1)
            return _dense(x, params[2])

    else:
        raise NotImplementedError(f"unknown architecture {architecture!r}")

    return Architecture(
        init=init,
        apply=apply,
        name=architecture,
        input_shape=hwc,
        output_size=int(output_size),
        hidden_size=int(hidden_size),
        activation=activation,
    )
