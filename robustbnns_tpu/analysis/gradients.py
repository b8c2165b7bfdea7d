"""Expected loss gradients over the posterior (reference ``lossGradients.py``).

The central quantity of the paper: ``⟨∂L/∂x⟩_{p(w|D)}`` estimated with S
posterior samples. Reference semantics (``lossGradients.py:20-68``):

* per image, loop samples ``i = 0..S-1`` calling
  ``forward(n_samples=1, seeds=[i])`` — so the SAME fixed draws are reused
  across all images — compute CE of the (softmax-probability) output, backprop
  to the input, and average the S gradients;
* the CE is applied to the single-sample softmax output (the probability-CE
  quirk, see :mod:`robustbnns_tpu.attacks.gradient_attacks`);
* results are pickled per sample count as ``<name>_samp=<n>_lossGrads``
  (``lossGradients.py:70-76``).

TPU-first: the reference's image×sample double Python loop
(``lossGradients.py:29-40,56-60``) becomes ``vmap`` over a stacked sample axis
of one batched forward/backward per sample — S × (batch forward+backward) on
the MXU, sharing the fixed draws across images exactly as the reference does.

The reference's deterministic branch is dead code (undefined ``net_copy`` /
``x_copy``, ``lossGradients.py:42-48``); here ``n_samples=None`` computes the
working equivalent: the input gradient of the CE of the deterministic output.

Vanishing-gradient detection (``lossGradients.py:78-127``): an image's
expected-gradient norm sequence over increasing sample counts is "vanishing"
iff it is monotone non-increasing (the reference's ``<=`` chain — note index 0
compares against itself, so the first element always passes) and the first
norm is nonzero; zero-first-norm images are "null", the rest "increasing".
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustbnns_tpu.attacks.gradient_attacks import ce_on_outputs
from robustbnns_tpu.config import DATA


@partial(jax.jit, static_argnames=("apply_fn",))
def _per_sample_input_grads(apply_fn, stacked_params, x, labels):
    """∇ₓ Σ_i CE(softmax(f_{w_s}(x_i)), y_i) for every sample s — (S, B, ...)."""

    def one_sample(params):
        def total_loss(x):
            probs = jax.nn.softmax(apply_fn(params, x), axis=-1)
            return jnp.sum(ce_on_outputs(probs, labels))

        return jax.grad(total_loss)(x)

    return jax.vmap(one_sample)(stacked_params)


def expected_loss_gradients(
    model,
    x,
    y,
    *,
    n_samples: Optional[int],
    seeds: Optional[Sequence[int]] = None,
    batch_size: int = 128,
    mesh=None,
) -> jax.Array:
    """Mean input gradient over S fixed posterior draws — shape like ``x``.

    ``model`` is a BNN (SVI or HMC) for the Bayesian estimate, or any model
    with ``predictive_fn`` for the deterministic case (``n_samples=None``).
    ``seeds`` defaults to ``range(n_samples)`` — the reference's fixed-draw
    scheme (``lossGradients.py:29-33``).

    With ``mesh`` (or a process default) the stacked draws shard over the
    mesh's ``sample`` axis and each batch over ``data`` — the two real scaling
    axes of this estimator; the mean over draws becomes a ``psum`` over ICI.
    """
    from robustbnns_tpu.parallel.mesh import resolve_mesh, shard_axis

    mesh = resolve_mesh(mesh)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    labels = jnp.argmax(y, axis=-1) if y.ndim > 1 else y

    if n_samples is None:
        forward = model.predictive_fn()

        @jax.jit
        def det_grads(x, labels):
            return jax.grad(
                lambda xx: jnp.sum(ce_on_outputs(forward(xx), labels))
            )(x)

        chunks = []
        for i in range(0, x.shape[0], batch_size):
            bx = x[i : i + batch_size]
            bl = labels[i : i + batch_size]
            if mesh is not None:
                bx = shard_axis(bx, mesh, 0, "data")
                bl = shard_axis(bl, mesh, 0, "data")
            chunks.append(det_grads(bx, bl))
        return jnp.concatenate(chunks)

    if seeds is None:
        seeds = list(range(n_samples))
    if len(seeds) != n_samples:
        raise ValueError("Number of seeds should match number of samples.")

    # Materialize the S fixed draws once (reference reuses draws across images).
    from robustbnns_tpu.inference.svi import sample_meanfield
    from robustbnns_tpu.utils.prng import keys_from_seeds
    from robustbnns_tpu.utils.pytree import index_tree

    if getattr(model, "posterior", None) is not None:  # SVI
        keys = keys_from_seeds(seeds)
        stacked = jax.vmap(lambda k: sample_meanfield(model.posterior, k))(keys)
    elif getattr(model, "samples", None) is not None:  # HMC
        stacked = index_tree(model.samples, jnp.asarray(seeds, jnp.int32))
    elif getattr(model, "stacked_params", None) is not None:  # ensemble
        stacked = index_tree(model.stacked_params, jnp.asarray(seeds, jnp.int32))
    else:
        raise ValueError("model has no posterior/samples — train() or load() first")

    if mesh is not None:
        stacked = jax.tree_util.tree_map(
            lambda a: shard_axis(a, mesh, 0, "sample"), stacked
        )

    chunks = []
    for i in range(0, x.shape[0], batch_size):
        bx = x[i : i + batch_size]
        bl = labels[i : i + batch_size]
        if mesh is not None:
            bx = shard_axis(bx, mesh, 0, "data")
            bl = shard_axis(bl, mesh, 0, "data")
        g = _per_sample_input_grads(model.arch.apply, stacked, bx, bl)
        chunks.append(g.mean(axis=0))
    return jnp.concatenate(chunks)


def loss_gradients(
    model,
    x,
    y,
    *,
    n_samples: Optional[int],
    filename: str,
    savedir: str,
    rel_path: str = DATA,
    batch_size: int = 128,
    mesh=None,
    verbose: bool = True,
) -> np.ndarray:
    """Compute + persist expected gradients (reference ``lossGradients.py:52-68``).

    Returns the squeezed numpy array the plotting layer consumes.
    """
    if verbose:
        print(f"\n === Loss gradients on {len(x)} input images:")
    grads = expected_loss_gradients(
        model, x, y, n_samples=n_samples, batch_size=batch_size, mesh=mesh
    )
    if verbose:
        print(f"\nmin = {float(grads.min()):.4f} \t max = {float(grads.max()):.4f}")
    out = np.asarray(grads).squeeze()
    save_loss_gradients(out, n_samples, filename, savedir, rel_path)
    return out


def _grads_path(n_samples, filename, savedir, rel_path) -> str:
    """Reference naming scheme (``lossGradients.py:70-76``)."""
    return os.path.join(
        rel_path, savedir, f"{filename}_samp={n_samples}_lossGrads.npz"
    )


def save_loss_gradients(grads, n_samples, filename, savedir, rel_path=DATA):
    path = _grads_path(n_samples, filename, savedir, rel_path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, loss_gradients=np.asarray(grads))
    return path


def load_loss_gradients(n_samples, filename, savedir, rel_path=DATA) -> np.ndarray:
    with np.load(_grads_path(n_samples, filename, savedir, rel_path)) as data:
        return data["loss_gradients"]


def compute_vanishing_norms_idxs(
    loss_gradients: np.ndarray,
    n_samples_list: Sequence[int],
    norm: str = "linfty",
    verbose: bool = True,
) -> list[int]:
    """Indices of images whose gradient norms vanish with more samples.

    ``loss_gradients`` has shape ``(n_images, len(n_samples_list), ...)``
    (reference ``lossGradients.py:78-127``; see module docstring for the
    monotonicity rule).
    """
    grads = np.asarray(loss_gradients)
    if grads.shape[1] != len(n_samples_list):
        raise ValueError("Second dimension should equal the length of `n_samples_list`")

    flat = grads.reshape(grads.shape[0], grads.shape[1], -1)
    if norm == "linfty":
        norms = np.max(np.abs(flat), axis=-1)
    elif norm == "l2":
        norms = np.linalg.norm(flat, axis=-1)
    else:
        raise ValueError(f"unknown norm {norm!r}")

    first_nonzero = norms[:, 0] != 0.0
    monotone = np.all(np.diff(norms, axis=1) <= 0.0, axis=1)

    vanishing = first_nonzero & monotone
    increasing = first_nonzero & ~monotone
    null = ~first_nonzero

    idxs = [int(i) for i in np.nonzero(vanishing)[0]]
    if verbose:
        n = len(grads)
        print(f"vanishing gradients = {vanishing.sum() / n} %")
        print(f"increasing gradients = {increasing.sum() / n} %")
        print(f"null gradients = {null.sum() / n} %")
        print("\nvanishing_gradients_idxs = ", idxs)
    return idxs
