"""Batching utilities.

The reference wraps arrays in ``torch.utils.data.DataLoader`` (reference
``utils.py:25-37``); on TPU the idiomatic equivalent is whole-dataset device
arrays batched by reshaping, so the training loop can be a single jitted
``lax.scan`` over the batch axis with no host↔device transfer per step.

:class:`Batches` precomputes a ``(num_batches, batch_size, ...)`` view with a
per-epoch permutation and a validity mask for the final ragged batch (the
reference's DataLoader keeps the partial last batch; we mask instead of
dropping so sums/accuracies match exactly).
"""
from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class EpochBatches(NamedTuple):
    """One epoch's batches, stacked for ``lax.scan``.

    ``x``: ``(num_batches, batch_size, ...)``;
    ``y``: ``(num_batches, batch_size, n_classes)`` one-hot;
    ``mask``: ``(num_batches, batch_size)`` — 1.0 for real rows, 0.0 for the
    zero-padding in the final partial batch.
    """

    x: jax.Array
    y: jax.Array
    mask: jax.Array


def batch_arrays(
    x: jax.Array,
    y: jax.Array,
    batch_size: int,
    *,
    perm: Optional[jax.Array] = None,
) -> EpochBatches:
    """Pad + reshape arrays into scan-ready batches (device-side, jittable)."""
    n = x.shape[0]
    num_batches = -(-n // batch_size)
    pad = num_batches * batch_size - n

    if perm is not None:
        x = x[perm]
        y = y[perm]

    mask = jnp.concatenate([jnp.ones((n,), x.dtype), jnp.zeros((pad,), x.dtype)])
    x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    y = jnp.concatenate([y, jnp.zeros((pad,) + y.shape[1:], y.dtype)])

    return EpochBatches(
        x=x.reshape((num_batches, batch_size) + x.shape[1:]),
        y=y.reshape((num_batches, batch_size) + y.shape[1:]),
        mask=mask.reshape(num_batches, batch_size),
    )


class Batches:
    """Epoch iterator with per-epoch reshuffling.

    Mirrors ``DataLoader(shuffle=True)`` semantics (fresh permutation each
    epoch, reference ``utils.py:30-35``) but keeps all data on device and
    yields scan-ready :class:`EpochBatches`.
    """

    def __init__(
        self,
        x: np.ndarray | jax.Array,
        y: np.ndarray | jax.Array,
        batch_size: int,
        *,
        shuffle: bool = True,
        key: Optional[jax.Array] = None,
    ) -> None:
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.key = key if key is not None else jax.random.key(0)
        self.n = self.x.shape[0]
        self.num_batches = -(-self.n // self.batch_size)

    def epoch(self, epoch_idx: int) -> EpochBatches:
        perm = None
        if self.shuffle:
            perm = jax.random.permutation(
                jax.random.fold_in(self.key, epoch_idx), self.n
            )
        return batch_arrays(self.x, self.y, self.batch_size, perm=perm)

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array, jax.Array]]:
        eb = self.epoch(0)
        for i in range(self.num_batches):
            yield eb.x[i], eb.y[i], eb.mask[i]


def classwise_arrays(
    x: np.ndarray,
    y: np.ndarray,
    n_inputs: Optional[int],
    num_classes: int,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Per-class subsets, first ``n_inputs`` of each (reference ``utils.py:39-64``)."""
    out = []
    labels = np.argmax(y, axis=-1)
    for label in range(num_classes):
        idx = labels == label
        out.append((x[idx][:n_inputs], y[idx][:n_inputs]))
    return out
