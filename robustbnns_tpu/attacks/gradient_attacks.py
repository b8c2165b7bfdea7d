"""FGSM and PGD — classic and Bayesian — as batched, jitted attack programs.

Reference semantics (``adversarialAttacks.py:69-198``), reproduced exactly:

* **FGSM** (``:69-83``): ``x' = clamp(x + ε·sign(∇ₓ CE(f(x), y)), 0, 1)``,
  default ε = 0.3;
* **PGD** (``:86-108``): 40 iterations of full sign steps with
  ``alpha = 2 / image.max()`` when an ε is supplied (≈ 2.0 for [0,1] images —
  effectively a full-ε jump re-projected each iteration) or
  ``(ε, α, iters) = (0.5, 2/225, 40)`` without hyperparameters; per-iteration
  projection of ``x' − x₀`` to the ε-ball then clamp to [0, 1]; no random start;
* **CE-on-outputs quirk**: the loss is ``torch.nn.CrossEntropyLoss`` applied to
  *whatever the model emits* (``:76,99``) — raw logits for NN/ensemble/
  ``avg_posterior`` but **averaged probabilities** for the Bayesian models
  (consequence of ``model_bnn.py:257``), i.e. ``−log_softmax(probs)[y]``.
  This changes the gradient field and therefore the published numbers; it is
  reproduced by computing the CE on the model output verbatim;
* **Bayesian re-sampling**: the posterior is drawn fresh on *every* forward
  call — every PGD iteration sees new weights (no seeds are passed,
  ``:97``).

TPU-first design vs the reference's one-image-at-a-time tqdm loop (``:118``):

* the test set is attacked in **batches**: per-image CE losses are summed and
  differentiated in one backward pass, which yields exactly the per-image
  gradients (outputs are row-wise independent);
* PGD's 40 iterations are a ``lax.scan``; the whole per-batch attack is one
  jitted dispatch, and batches are scanned on device;
* for Bayesian models the fresh draws of an iteration are **shared across the
  images of a batch** (one vmapped sample axis) instead of re-drawn per image.
  Each image still sees ``n_samples`` fresh iid draws per iteration, so every
  *per-image marginal* statistic (adversarial accuracy, softmax robustness,
  gradient distribution) is distributed identically to the reference's; only
  cross-image correlations — which no reported metric uses — differ. This is
  what turns S·B independent little forwards into S batched MXU matmuls.

``forward_fn`` is any pure function ``f(x)`` (deterministic) or ``f(x, key)``
(stochastic Bayesian predictive) — the closures produced by
``model.predictive_fn(...)``.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robustbnns_tpu.attacks.measures import softmax_robustness
from robustbnns_tpu.config import TESTS


def _shard_attack_args(mesh, state, arrays):
    """Mesh placement for one attack batch: batch-axis arrays shard over
    ``data``, the model state replicates. ``arrays`` whose leading dim doesn't
    divide the mesh (ragged tail batches) replicate — correct, just local."""
    from robustbnns_tpu.parallel.mesh import replicate, shard_axis

    state = replicate(state, mesh) if state is not None else None
    return state, tuple(
        a if not hasattr(a, "shape") or a.ndim == 0 else shard_axis(a, mesh, 0, "data")
        for a in arrays
    )


def ce_on_outputs(outputs: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-example ``CrossEntropyLoss`` applied to the raw model output.

    The reference feeds the model output straight into
    ``torch.nn.CrossEntropyLoss`` (``adversarialAttacks.py:76,99``), which
    internally does ``-log_softmax(output)[label]`` — correct for logits,
    a deliberate quirk for the BNN's probability outputs. Faithful either way.
    """
    logp = jax.nn.log_softmax(outputs, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def _input_gradients(forward_fn, x, labels, key):
    """Per-image ∇ₓ CE — one batched forward/backward (summed CE trick)."""

    def total_loss(x):
        return jnp.sum(ce_on_outputs(forward_fn(x, key), labels))

    return jax.grad(total_loss)(x)


@partial(jax.jit, static_argnames=("forward_fn",))
def _fgsm_batch(forward_fn, x, labels, epsilon, key):
    grads = _input_gradients(forward_fn, x, labels, key)
    x_adv = x + epsilon * jnp.sign(grads)
    return jnp.clip(x_adv, 0.0, 1.0)


@partial(jax.jit, static_argnames=("pure_fn",))
def _fgsm_batch_pure(pure_fn, state, x, labels, epsilon, key):
    """FGSM with model state as a traced argument (see predict.attach_pure)."""
    grads = _input_gradients(lambda xx, k: pure_fn(state, xx, k), x, labels, key)
    return jnp.clip(x + epsilon * jnp.sign(grads), 0.0, 1.0)


@partial(jax.jit, static_argnames=("forward_fn", "iters"))
def _pgd_batch(forward_fn, iters, x, labels, epsilon, alpha, key):
    x0 = x

    def body(x, it_key):
        grads = _input_gradients(forward_fn, x, labels, it_key)
        x_adv = x + alpha * jnp.sign(grads)
        eta = jnp.clip(x_adv - x0, -epsilon, epsilon)
        return jnp.clip(x0 + eta, 0.0, 1.0), None

    keys = jax.random.split(key, iters)
    x, _ = jax.lax.scan(body, x, keys)
    return x


@partial(jax.jit, static_argnames=("pure_fn", "iters"))
def _pgd_batch_pure(pure_fn, iters, state, x, labels, epsilon, alpha, key):
    """PGD with model state as a traced argument (see predict.attach_pure)."""
    x0 = x

    def body(x, it_key):
        grads = _input_gradients(
            lambda xx, k: pure_fn(state, xx, k), x, labels, it_key
        )
        x_adv = x + alpha * jnp.sign(grads)
        eta = jnp.clip(x_adv - x0, -epsilon, epsilon)
        return jnp.clip(x0 + eta, 0.0, 1.0), None

    keys = jax.random.split(key, iters)
    x, _ = jax.lax.scan(body, x, keys)
    return x


def fgsm_attack(
    forward_fn: Callable,
    x: jax.Array,
    y: jax.Array,
    *,
    epsilon: float = 0.3,
    key: Optional[jax.Array] = None,
    mesh=None,
) -> jax.Array:
    """Batched FGSM (reference ``adversarialAttacks.py:69-83``).

    ``y`` may be one-hot or integer labels. ``key`` seeds the Bayesian
    posterior draws (ignored by deterministic forwards). With ``mesh`` (or a
    process default) the batch shards over the mesh's ``data`` axis — attacks
    are embarrassingly batch-parallel, zero collectives.
    """
    labels = y if y.ndim == 1 else jnp.argmax(y, axis=-1)
    key = key if key is not None else jax.random.key(0)
    from robustbnns_tpu.parallel.mesh import resolve_mesh
    from robustbnns_tpu.predict import normalize_forward, split_pure

    mesh = resolve_mesh(mesh)
    pure_fn, state = split_pure(forward_fn)
    if pure_fn is not None:
        if mesh is not None:
            state, (x, labels) = _shard_attack_args(mesh, state, (x, labels))
        return _fgsm_batch_pure(pure_fn, state, x, labels, epsilon, key)
    if mesh is not None:
        _, (x, labels) = _shard_attack_args(mesh, None, (x, labels))
    return _fgsm_batch(normalize_forward(forward_fn), x, labels, epsilon, key)


def pgd_attack(
    forward_fn: Callable,
    x: jax.Array,
    y: jax.Array,
    *,
    epsilon: Optional[float] = 0.3,
    alpha: Optional[float] = None,
    iters: int = 40,
    key: Optional[jax.Array] = None,
    mesh=None,
) -> jax.Array:
    """Batched 40-iteration PGD (reference ``adversarialAttacks.py:86-108``).

    With ``epsilon`` given and ``alpha=None``, uses the reference's per-image
    step ``alpha = 2 / image.max()`` (``:89``); ``epsilon=None`` selects the
    reference's no-hyperparameter defaults ``(0.5, 2/225, 40)`` (``:91``).
    With ``mesh`` (or a process default) the batch shards over ``data``.
    """
    labels = y if y.ndim == 1 else jnp.argmax(y, axis=-1)
    key = key if key is not None else jax.random.key(0)
    if epsilon is None:
        epsilon, alpha = 0.5, 2.0 / 225.0
    if alpha is None:
        # per-image max, broadcast over the image dims
        per_image_max = jnp.max(
            jnp.reshape(x, (x.shape[0], -1)), axis=-1
        ).reshape((x.shape[0],) + (1,) * (x.ndim - 1))
        alpha = 2.0 / per_image_max
    from robustbnns_tpu.parallel.mesh import resolve_mesh
    from robustbnns_tpu.predict import normalize_forward, split_pure

    mesh = resolve_mesh(mesh)
    pure_fn, state = split_pure(forward_fn)
    if pure_fn is not None:
        if mesh is not None:
            state, (x, labels, alpha) = _shard_attack_args(
                mesh, state, (x, labels, alpha)
            )
        return _pgd_batch_pure(
            pure_fn, iters, state, x, labels, epsilon, alpha, key
        )
    if mesh is not None:
        _, (x, labels, alpha) = _shard_attack_args(mesh, None, (x, labels, alpha))
    return _pgd_batch(
        normalize_forward(forward_fn), iters, x, labels, epsilon, alpha, key
    )


# --------------------------------------------------------------------------- #
# High-level drivers (reference adversarialAttacks.py:111-198)
# --------------------------------------------------------------------------- #


def attack(
    model,
    x_test,
    y_test,
    *,
    method: str,
    epsilon: float = 0.3,
    n_samples: Optional[int] = None,
    avg_posterior: bool = False,
    fused: bool = False,
    key: Optional[jax.Array] = None,
    batch_size: int = 128,
    mesh=None,
    filename: Optional[str] = None,
    savedir: Optional[str] = None,
    rel_path: str = TESTS,
    save: bool = True,
    verbose: bool = True,
) -> jax.Array:
    """Attack a whole test set (reference ``attack()``, ``:111-143``).

    ``model`` is anything with ``predictive_fn(n_samples, avg_posterior=...)``
    — NN, BNN or ensemble. Batches are processed as jitted device programs
    instead of the reference's per-image Python loop. ``fused=True`` selects
    the Pallas fused predictive (SVI fc/fc2 — the TPU throughput path).
    ``mesh`` (or a process default) shards every batch over the mesh's
    ``data`` axis — the multi-chip replacement for the reference's joblib
    fan-out of attack work (``grid_search_halfMoons.py:122-131``).
    """
    if verbose:
        print(f"\nProducing {method} attacks:")
    x = jnp.asarray(x_test)
    y = jnp.asarray(y_test)
    key = key if key is not None else jax.random.key(0)
    kwargs = {"fused": True} if fused else {}
    forward_fn = model.predictive_fn(
        n_samples=n_samples, avg_posterior=avg_posterior, **kwargs
    )

    chunks = []
    nb = -(-x.shape[0] // batch_size)
    for i in range(nb):
        bx = x[i * batch_size : (i + 1) * batch_size]
        by = y[i * batch_size : (i + 1) * batch_size]
        bkey = jax.random.fold_in(key, i)
        if method == "fgsm":
            adv = fgsm_attack(
                forward_fn, bx, by, epsilon=epsilon, key=bkey, mesh=mesh
            )
        elif method == "pgd":
            adv = pgd_attack(
                forward_fn, bx, by, epsilon=epsilon, key=bkey, mesh=mesh
            )
        else:
            raise ValueError(f"unknown attack method {method!r}")
        chunks.append(adv)
    x_adv = jnp.concatenate(chunks)

    if save and filename is not None:
        save_attack(
            x_adv,
            method=method,
            filename=filename,
            savedir=savedir,
            n_samples=n_samples,
            rel_path=rel_path,
        )
        # Reference also dumps original/adversarial image grids
        # (adversarialAttacks.py:135-141).
        from robustbnns_tpu.utils.plotting import plot_save_grid_images

        d = os.path.join(rel_path, savedir if savedir is not None else filename)
        plot_save_grid_images(np.asarray(x), f"{filename}_{method}_original.png", d)
        plot_save_grid_images(np.asarray(x_adv), f"{filename}_{method}_attack.png", d)
    return x_adv


def _attack_path(method, filename, savedir, n_samples, rel_path) -> str:
    """Reference naming scheme (``adversarialAttacks.py:135-141,145-149``)."""
    d = os.path.join(rel_path, savedir if savedir is not None else filename)
    name = f"{filename}_{method}"
    name += f"_attackSamp={n_samples}_attack" if n_samples else "_attack"
    return os.path.join(d, name + ".npz")


def save_attack(x_adv, *, method, filename, savedir=None, n_samples=None, rel_path=TESTS):
    path = _attack_path(method, filename, savedir, n_samples, rel_path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, x_adv=np.asarray(x_adv))
    return path


def load_attack(*, method, filename, savedir=None, n_samples=None, rel_path=TESTS):
    path = _attack_path(method, filename, savedir, n_samples, rel_path)
    with np.load(path) as data:
        return jnp.asarray(data["x_adv"])


def attack_evaluation(
    model,
    x_test,
    x_attack,
    y_test,
    *,
    n_samples: Optional[int] = None,
    key: Optional[jax.Array] = None,
    batch_size: int = 128,
    mesh=None,
    verbose: bool = True,
):
    """Clean vs adversarial accuracy + softmax robustness (reference ``:151-198``).

    Evaluation draws are seeded (``key`` defaults to seed 0, mirroring the
    reference's ``pyro.set_rng_seed(0)`` at ``:160-161``). With ``mesh`` the
    per-batch rows shard over the mesh's ``data`` axis.
    """
    from robustbnns_tpu.predict import batched_eval

    key = key if key is not None else jax.random.key(0)
    forward_fn = model.predictive_fn(n_samples=n_samples)
    x = jnp.asarray(x_test)
    xa = jnp.asarray(x_attack)
    y = jnp.asarray(y_test)

    k1, k2 = jax.random.split(key)
    original_outputs, orig_correct = batched_eval(
        forward_fn, x, y, batch_size=batch_size, key=k1, mesh=mesh
    )
    adversarial_outputs, adv_correct = batched_eval(
        forward_fn, xa, y, batch_size=batch_size, key=k2, mesh=mesh
    )

    original_accuracy = 100.0 * float(orig_correct) / x.shape[0]
    adversarial_accuracy = 100.0 * float(adv_correct) / x.shape[0]
    if verbose:
        print(
            f"\ntest accuracy = {original_accuracy}\t"
            f"adversarial accuracy = {adversarial_accuracy}",
            end="\t",
        )
    softmax_rob = softmax_robustness(
        original_outputs, adversarial_outputs, verbose=verbose
    )
    return original_accuracy, adversarial_accuracy, softmax_rob
