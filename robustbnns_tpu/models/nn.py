"""Deterministic NN training/evaluation (reference ``model_nn.py:175-239``).

The reference's hot loop is a Python batch loop with host→device copies per
batch; here the whole epoch is one jitted ``lax.scan`` over pre-batched device
arrays — the TPU never waits on the host between steps.

Semantics preserved:

* Adam with torch defaults (betas 0.9/0.999, eps 1e-8) at the config ``lr``
  (reference ``model_nn.py:190``);
* cross-entropy on raw logits vs integer labels (mean-reduced per batch,
  reference ``model_nn.py:44,203``);
* per-epoch reshuffled batches (``DataLoader(shuffle=True)``);
* epoch log line of ``total_loss/N`` and accuracy (reference
  ``model_nn.py:211-213``).
"""
from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from robustbnns_tpu.data.loaders import batch_arrays
from robustbnns_tpu.models.architectures import Architecture, Params
from robustbnns_tpu.utils.timing import execution_time


def cross_entropy(logits: jax.Array, labels: jax.Array, mask=None) -> jax.Array:
    """Mean cross-entropy over valid rows; ``labels`` are integer classes."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if mask is None:
        return jnp.mean(nll)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


@dataclasses.dataclass
class DeterministicNN:
    """A trained deterministic network: architecture + parameter pytree."""

    arch: Architecture
    params: Params
    name: Optional[str] = None  # checkpoint identity (reference model_nn.py:56)
    _fn: object = dataclasses.field(default=None, repr=False)  # memoized closure

    def save(self, rel_path: str, savedir: Optional[str] = None, seed=None) -> str:
        """Persist weights under the reference's naming scheme
        (``model_nn.py:143-151``): ``<dir>/<name>_weights[_<seed>].npz``."""
        from robustbnns_tpu.utils.checkpoint import save_pytree

        if self.name is None:
            raise ValueError("set model.name before saving")
        directory = savedir if savedir is not None else self.name
        fname = f"{self.name}_weights" + (f"_{seed}" if seed is not None else "")
        path = save_pytree(self.params, os.path.join(rel_path, directory, fname))
        print("\nSaving: ", path)
        return path

    def load(self, rel_path: str, savedir: Optional[str] = None, seed=None):
        """Load weights saved by :meth:`save` (``model_nn.py:158-168``)."""
        from robustbnns_tpu.utils.checkpoint import load_pytree

        if self.name is None:
            raise ValueError("set model.name before loading")
        directory = savedir if savedir is not None else self.name
        fname = f"{self.name}_weights" + (f"_{seed}" if seed is not None else "")
        path = os.path.join(rel_path, directory, fname)
        template = self.params if self.params is not None else self.arch.init(
            jax.random.key(0)
        )
        self.params = load_pytree(template, path)
        self._fn = None  # drop the closure over the old params
        print("\nLoading: ", path)
        return self

    def logits(self, x: jax.Array) -> jax.Array:
        return self.arch.apply(self.params, x)

    def forward(self, x: jax.Array, n_samples=None, **_ignored) -> jax.Array:
        """Duck-typed predictive surface shared with BNN/ensemble: raw logits.

        Extra keyword arguments (``n_samples``/``avg_posterior``/...) are
        accepted and ignored, mirroring the reference's ``NN.forward(*args,
        **kwargs)`` signature (``model_nn.py:126``) that lets one attack
        implementation serve every model type.
        """
        return self.arch.apply(self.params, x)

    def predictive_fn(self, n_samples=None, **_ignored):
        """A pure ``f(x) -> logits`` closure for attacks/analysis.

        Memoized: repeated calls return the same function object so jitted
        consumers compile once.
        """
        if self._fn is None:
            from robustbnns_tpu.predict import attach_pure

            apply = self.arch.apply
            fn = lambda x: apply(self.params, x)
            attach_pure(fn, lambda state, x, key: apply(state[0], x), (self.params,))
            self._fn = fn
        return self._fn


@partial(jax.jit, static_argnames=("apply_fn", "optimizer", "batch_size"))
def _train_epoch(apply_fn, optimizer, batch_size, params, opt_state, x, y, key):
    """One epoch as a SINGLE device dispatch.

    Shuffling, batching and the ``lax.scan`` over batches all live inside the
    jit: the host issues one call per epoch instead of one per batch (the
    reference pays a host→device copy per batch, ``model_nn.py:197-199``).
    Returns updated (params, opt_state) plus summed loss and correct counts for
    reference-style logging.
    """
    perm = jax.random.permutation(key, x.shape[0])
    xb, yb, mb = batch_arrays(x, y, batch_size, perm=perm)

    def step(carry, batch):
        params, opt_state = carry
        x, y_onehot, mask = batch
        labels = jnp.argmax(y_onehot, axis=-1)

        def loss_fn(p):
            logits = apply_fn(p, x)
            return cross_entropy(logits, labels, mask), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * mask)
        return (params, opt_state), (loss, correct)

    (params, opt_state), (losses, corrects) = jax.lax.scan(
        step, (params, opt_state), (xb, yb, mb)
    )
    return params, opt_state, jnp.sum(losses), jnp.sum(corrects)


def train_nn(
    arch: Architecture,
    x_train,
    y_train,
    *,
    epochs: int,
    lr: float,
    batch_size: int = 64,
    seed: int = 0,
    name: Optional[str] = None,
    mesh=None,
    verbose: bool = True,
) -> DeterministicNN:
    """Train a deterministic NN (reference ``model_nn.py:175-219``).

    ``seed`` controls both init and batch shuffling, mirroring the reference's
    full-determinism seeding block (``model_nn.py:182-188``).

    With ``mesh`` (or a process default), the dataset shards over the mesh's
    ``data`` axis and the parameters replicate — data-parallel SPMD training
    with XLA-inserted ``psum`` gradient reductions.
    """
    key = jax.random.key(seed)
    init_key, shuffle_key = jax.random.split(key)
    params = arch.init(init_key)

    optimizer = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = optimizer.init(params)

    x = jnp.asarray(x_train)
    y = jnp.asarray(y_train)
    n = x.shape[0]

    from robustbnns_tpu.parallel.mesh import replicate, resolve_mesh, shard_axis

    mesh = resolve_mesh(mesh)
    if mesh is not None:
        x = shard_axis(x, mesh, 0, "data")
        y = shard_axis(y, mesh, 0, "data")
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)

    start = time.time()
    stats = []
    for epoch in range(epochs):
        params, opt_state, loss_sum, correct = _train_epoch(
            arch.apply,
            optimizer,
            batch_size,
            params,
            opt_state,
            x,
            y,
            jax.random.fold_in(shuffle_key, epoch),
        )
        stats.append((loss_sum, correct))
    if verbose:
        # Sync once at the end, not per epoch — keeps the device pipelined.
        for epoch, (loss_sum, correct) in enumerate(stats):
            total_loss = float(loss_sum) / n
            accuracy = 100.0 * float(correct) / n
            print(
                f"\n[Epoch {epoch + 1}]\t loss: {total_loss:.8f} \t "
                f"accuracy: {accuracy:.2f}",
                end="\t",
            )
        execution_time(start=start, end=time.time())

    return DeterministicNN(arch=arch, params=params, name=name)


@partial(jax.jit, static_argnames=("apply_fn", "batch_size"))
def _count_correct(apply_fn, batch_size, params, x, y):
    xb, yb, mb = batch_arrays(x, y, batch_size)

    def step(_, batch):
        x, y, mask = batch
        logits = apply_fn(params, x)
        correct = jnp.sum((jnp.argmax(logits, -1) == jnp.argmax(y, -1)) * mask)
        return None, correct

    _, corrects = jax.lax.scan(step, None, (xb, yb, mb))
    return jnp.sum(corrects)


def evaluate_nn(
    model: DeterministicNN,
    x_test,
    y_test,
    *,
    batch_size: int = 128,
    verbose: bool = True,
) -> float:
    """Accuracy in percent (reference ``model_nn.py:221-239``)."""
    x = jnp.asarray(x_test)
    y = jnp.asarray(y_test)
    correct = _count_correct(model.arch.apply, batch_size, model.params, x, y)
    accuracy = 100.0 * float(correct) / x.shape[0]
    if verbose:
        print("\nAccuracy: %.2f%%" % accuracy)
    return accuracy
