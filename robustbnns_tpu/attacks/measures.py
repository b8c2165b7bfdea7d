"""Robustness measures (reference ``adversarialAttacks.py:30-62``).

Faithful quirk: :func:`softmax_difference` re-applies softmax to the model
outputs (reference ``adversarialAttacks.py:36-37``) even when those outputs are
*already* averaged probabilities for BNN/ensemble models — a double softmax
that compresses the differences. Reproduced by default because every published
robustness number depends on it; pass ``renormalize=False`` for the
mathematically-plain variant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_difference(
    original_predictions: jax.Array,
    adversarial_predictions: jax.Array,
    *,
    renormalize: bool = True,
) -> jax.Array:
    """Pointwise l∞ norm of the softmax-output difference, in [0, 1].

    Reference ``adversarialAttacks.py:30-51`` (including the range check and
    the double-softmax behaviour — see module docstring).
    """
    if original_predictions.shape[0] != adversarial_predictions.shape[0]:
        raise ValueError("Input arrays should have the same length.")
    if renormalize:
        original_predictions = jax.nn.softmax(original_predictions, axis=-1)
        adversarial_predictions = jax.nn.softmax(adversarial_predictions, axis=-1)
    diff = jnp.abs(original_predictions - adversarial_predictions)
    norms = jnp.max(diff, axis=-1)
    return norms


def check_softmax_difference_range(norms) -> None:
    """The reference's runtime guard (``adversarialAttacks.py:48-49``)."""
    lo, hi = float(jnp.min(norms)), float(jnp.max(norms))
    if lo < 0.0 or hi > 1.0:
        raise ValueError("Softmax difference should be in [0,1]")


def softmax_robustness(
    original_outputs: jax.Array,
    adversarial_outputs: jax.Array,
    *,
    renormalize: bool = True,
    verbose: bool = True,
) -> jax.Array:
    """Pointwise robustness ``1 − softmax_difference`` (reference ``:53-62``)."""
    diffs = softmax_difference(
        original_outputs, adversarial_outputs, renormalize=renormalize
    )
    check_softmax_difference_range(diffs)
    robustness = 1.0 - diffs
    if verbose:
        print(f"avg softmax robustness = {float(robustness.mean()):.2f}")
    return robustness
