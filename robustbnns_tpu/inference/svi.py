"""Stochastic variational inference with a mean-field Gaussian posterior.

Replaces Pyro's effect-handler stack (``pyro.random_module`` lifted modules,
param store, ``TraceMeanField_ELBO``; reference ``model_bnn.py:105-136,303-348``)
with a 150-line functional core:

* the variational posterior is two pytrees ``{loc, rho}`` shaped like the
  network parameters, with ``scale = softplus(rho)`` (reference guide
  ``model_bnn.py:127``);
* the ELBO is the analytic Normal‖Normal KL (what ``TraceMeanField_ELBO``
  computes for a mean-field Gaussian guide against the iid N(0,1) prior,
  reference ``model_bnn.py:109-111,309``) plus a single-sample reparameterized
  Monte-Carlo estimate of the categorical log-likelihood, **summed** over the
  batch (Pyro sums inside the data plate, ``model_bnn.py:116-119``) with the KL
  counted once per step — including the reference's implicit quirk that the KL
  is *not* scaled by batch/dataset ratio, so it is over-counted by
  ``num_batches`` per epoch relative to a proper dataset ELBO;
* initialization is ``loc, rho ~ N(0,1)`` (reference ``model_bnn.py:125-126``
  inits both with ``torch.randn_like`` — note this gives initial scales
  ``softplus(N(0,1))`` ≈ 0.2–1.7, a reference quirk kept for parity);
* one **epoch** is one jitted dispatch: ``lax.scan`` over batches, each step =
  reparameterized draw → forward → ELBO grad → Adam update, plus (faithful
  mode) the reference's 10-sample posterior-predictive train-accuracy forward
  per batch (``model_bnn.py:327``) as a vmapped sample axis.
"""
from __future__ import annotations

import time
from functools import partial
from typing import TYPE_CHECKING, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from robustbnns_tpu.data.loaders import batch_arrays
from robustbnns_tpu.utils.pytree import normal_like_tree
from robustbnns_tpu.utils.timing import execution_time

if TYPE_CHECKING:  # avoid a models ↔ inference import cycle at runtime
    from robustbnns_tpu.models.architectures import Architecture, Params
else:
    Params = object


class MeanFieldPosterior(NamedTuple):
    """Variational parameters: ``q(w) = N(loc, softplus(rho)^2)`` per scalar."""

    loc: Params
    rho: Params


def init_meanfield(key: jax.Array, params_template: Params) -> MeanFieldPosterior:
    """Random init of loc and rho — reference ``model_bnn.py:125-126``."""
    kl, kr = jax.random.split(key)
    return MeanFieldPosterior(
        loc=normal_like_tree(kl, params_template),
        rho=normal_like_tree(kr, params_template),
    )


def meanfield_scale(posterior: MeanFieldPosterior) -> Params:
    return jax.tree_util.tree_map(jax.nn.softplus, posterior.rho)


def sample_meanfield(posterior: MeanFieldPosterior, key: jax.Array) -> Params:
    """One reparameterized weight draw: ``w = loc + softplus(rho)·eps``."""
    eps = normal_like_tree(key, posterior.loc)
    return jax.tree_util.tree_map(
        lambda m, r, e: m + jax.nn.softplus(r) * e, posterior.loc, posterior.rho, eps
    )


def gaussian_kl_to_std_normal(posterior: MeanFieldPosterior) -> jax.Array:
    """Analytic ``KL(N(loc, σ) ‖ N(0, 1))`` summed over all parameters.

    This is the closed-form term ``TraceMeanField_ELBO`` uses for a Gaussian
    guide/prior pair (reference ``model_bnn.py:309``).
    """

    def leaf_kl(m, r):
        s = jax.nn.softplus(r)
        return jnp.sum(0.5 * (s * s + m * m - 1.0) - jnp.log(s))

    kls = jax.tree_util.tree_map(leaf_kl, posterior.loc, posterior.rho)
    return jax.tree_util.tree_reduce(jnp.add, kls)


def categorical_loglik_sum(logits, labels, mask=None):
    """Σ_i log p(y_i | logits_i) — Pyro's in-plate sum (``model_bnn.py:116-119``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if mask is not None:
        ll = ll * mask
    return jnp.sum(ll)


def elbo_loss(
    apply_fn,
    posterior: MeanFieldPosterior,
    key: jax.Array,
    x: jax.Array,
    labels: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Negative ELBO for one batch: ``KL − Σ log p(y|x,w)``, ``w ~ q`` (1 sample)."""
    w = sample_meanfield(posterior, key)
    logits = apply_fn(w, x)
    return gaussian_kl_to_std_normal(posterior) - categorical_loglik_sum(
        logits, labels, mask
    )


@partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "optimizer", "batch_size", "train_acc_samples",
        "train_acc_bf16",
    ),
)
def _svi_epoch(
    apply_fn,
    optimizer,
    batch_size,
    train_acc_samples,
    posterior,
    opt_state,
    x,
    y,
    key,
    train_acc_bf16=False,
):
    """One SVI epoch as a single dispatch (reference hot loop ``model_bnn.py:316-341``).

    Per batch: one ELBO step, then (when ``train_acc_samples > 0``) a
    ``train_acc_samples``-sample posterior-predictive forward for the epoch
    accuracy — the reference runs 10 guide traces per batch for this
    (``model_bnn.py:327``); here they are a vmapped sample axis sharing one
    batched matmul.

    ``train_acc_bf16`` runs THAT predictive (and only it — the ELBO step stays
    f32) with bf16 matmuls: the forward feeds an argmax-only accuracy metric,
    so the precision loss cannot leak into training. Opt-in fast path for the
    faithful epoch, whose cost the 10-sample predictive dominates.
    """
    perm_key, scan_key = jax.random.split(key)
    perm = jax.random.permutation(perm_key, x.shape[0])
    xb, yb, mb = batch_arrays(x, y, batch_size, perm=perm)
    num_batches = xb.shape[0]
    step_keys = jax.random.split(scan_key, num_batches)

    def step(carry, batch):
        posterior, opt_state = carry
        bx, by, mask, k = batch
        labels = jnp.argmax(by, axis=-1)
        k_elbo, k_acc = jax.random.split(k)

        loss, grads = jax.value_and_grad(
            lambda p: elbo_loss(apply_fn, p, k_elbo, bx, labels, mask)
        )(posterior)
        updates, opt_state = optimizer.update(grads, opt_state, posterior)
        posterior = optax.apply_updates(posterior, updates)

        if train_acc_samples > 0:
            sample_keys = jax.random.split(k_acc, train_acc_samples)
            if train_acc_bf16:
                acc_x = bx.astype(jnp.bfloat16)
                cast = lambda w: jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16), w
                )
            else:
                acc_x = bx
                cast = lambda w: w
            probs = jax.vmap(
                lambda sk: jax.nn.softmax(
                    apply_fn(cast(sample_meanfield(posterior, sk)), acc_x).astype(
                        jnp.float32
                    ),
                    axis=-1,
                )
            )(sample_keys).mean(axis=0)
            correct = jnp.sum((jnp.argmax(probs, -1) == labels) * mask)
        else:
            correct = jnp.zeros((), bx.dtype)
        return (posterior, opt_state), (loss, correct)

    (posterior, opt_state), (losses, corrects) = jax.lax.scan(
        step, (posterior, opt_state), (xb, yb, mb, step_keys)
    )
    return posterior, opt_state, jnp.sum(losses), jnp.sum(corrects)


def svi_train(
    arch: Architecture,
    x_train,
    y_train,
    *,
    epochs: int,
    lr: float,
    batch_size: int = 128,
    seed: int = 0,
    train_acc_samples: int = 10,
    train_acc_bf16: Optional[bool] = None,
    mesh=None,
    verbose: bool = True,
):
    """Train a mean-field BNN posterior (reference ``_train_svi``).

    Returns ``(posterior, history)`` where history holds per-epoch summed loss
    and train accuracy (reference logs ``loss/N`` and accuracy,
    ``model_bnn.py:335-339``).

    ``train_acc_bf16`` (default: the ``ROBUSTBNNS_BF16_TRAINACC=1`` env
    opt-in) runs the per-batch train-accuracy predictive with bf16 matmuls —
    a metric-only fast path; the ELBO optimization itself is untouched.

    With ``mesh`` (or a process default, ``parallel.set_default_mesh``), the
    dataset shards over the mesh's ``data`` axis and the posterior/optimizer
    replicate — jit partitions the epoch program SPMD over the mesh, turning
    the gradient reductions into ``psum`` over ICI. Same math, same numbers.
    """
    import os

    from robustbnns_tpu.utils.prng import make_key

    if train_acc_bf16 is None:
        train_acc_bf16 = os.environ.get("ROBUSTBNNS_BF16_TRAINACC") == "1"
    key = make_key(seed)
    init_key, train_key = jax.random.split(key)
    posterior = init_meanfield(init_key, arch.init(jax.random.key(0)))

    optimizer = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = optimizer.init(posterior)

    x = jnp.asarray(x_train)
    y = jnp.asarray(y_train)
    n = x.shape[0]

    from robustbnns_tpu.parallel.mesh import replicate, resolve_mesh, shard_axis

    mesh = resolve_mesh(mesh)
    if mesh is not None:
        x = shard_axis(x, mesh, 0, "data")
        y = shard_axis(y, mesh, 0, "data")
        posterior = replicate(posterior, mesh)
        opt_state = replicate(opt_state, mesh)

    start = time.time()
    stats = []
    for epoch in range(epochs):
        posterior, opt_state, loss_sum, correct = _svi_epoch(
            arch.apply,
            optimizer,
            batch_size,
            train_acc_samples,
            posterior,
            opt_state,
            x,
            y,
            jax.random.fold_in(train_key, epoch),
            train_acc_bf16=bool(train_acc_bf16),
        )
        stats.append((loss_sum, correct))
        if verbose:
            # Stream the line as the epoch's dispatch completes (the reference
            # logs per epoch, ``model_bnn.py:335-339``); the float() is the
            # device sync, so a stalled backend is visible immediately instead
            # of after all epochs. Non-verbose keeps the fully-async pipeline.
            print(
                f"\n[Epoch {epoch + 1}]\t loss: {float(loss_sum) / n:.2f} \t "
                f"accuracy: {100.0 * float(correct) / n:.2f}",
                end="\t",
                flush=True,
            )

    history = {
        "loss": [float(l) for l, _ in stats],
        "accuracy": [100.0 * float(c) / n for _, c in stats],
    }
    if verbose:
        execution_time(start=start, end=time.time())
    return posterior, history
