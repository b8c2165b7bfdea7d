"""Fused SVI posterior predictive for dense architectures.

Chains the Pallas :func:`sampled_dense` / :func:`sampled_dense_xs` kernels
through an ``fc``/``fc2`` network: every layer draws its S weight samples
inside the kernel (per-layer decorrelated seeds), so the whole S-sample
predictive touches HBM only for activations — never for sampled weights.

This is the throughput path for Bayesian attacks and large-S evaluation; the
XLA path (:func:`robustbnns_tpu.predict.svi_predict`) remains the parity path
with the framework's seeded draw semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from robustbnns_tpu.models.architectures import ACTIVATIONS
from robustbnns_tpu.ops.sampled_dense import sampled_dense, sampled_dense_xs

_LAYER_SEED_STRIDE = 1000003  # decorrelate per-layer noise streams


def supports_fused(arch) -> bool:
    return arch.name in ("fc", "fc2")


def svi_predict_fused(arch, posterior, x, n_samples: int, seed=0) -> jax.Array:
    """Mean softmax over S fused draws — ``(batch, classes)``.

    ``seed`` may be a traced int32 scalar (vary it per attack iteration).
    Matches :func:`robustbnns_tpu.predict.svi_predict` semantics with a
    different (in-kernel) noise stream.
    """
    if not supports_fused(arch):
        raise NotImplementedError(
            f"fused predictive supports fc/fc2 (got {arch.name!r}); "
            "use the XLA path for conv architectures"
        )
    act = ACTIVATIONS[arch.activation]
    loc, rho = posterior.loc, posterior.rho
    xf = x.reshape(x.shape[0], -1)

    seed = jnp.asarray(seed, jnp.int32)
    h = sampled_dense(
        xf, loc[0]["w"], rho[0]["w"], loc[0]["b"], rho[0]["b"],
        n_samples, seed,
    )
    for li in range(1, len(loc)):
        h = act(h)
        h = sampled_dense_xs(
            h, loc[li]["w"], rho[li]["w"], loc[li]["b"], rho[li]["b"],
            n_samples, seed + li * _LAYER_SEED_STRIDE,
        )
    return jax.nn.softmax(h, axis=-1).mean(axis=0)


def fused_predictive_fn(arch, posterior, n_samples: int):
    """A stochastic ``f(x, key) -> probs`` closure over the fused path.

    Derives the kernel seed from the JAX key so attack loops that split keys
    per iteration get fresh draws, like the XLA stochastic predictive.
    """

    def forward(x, key):
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        return svi_predict_fused(arch, posterior, x, n_samples, seed)

    forward._rbnn_takes_key = True
    return forward
