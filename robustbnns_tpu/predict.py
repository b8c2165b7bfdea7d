"""The unified posterior-predictive — one function serving NN, BNN and ensemble.

Reference semantics (``BNN.forward``, ``model_bnn.py:198-258``; ``NN.forward``
``model_nn.py:126``; ``Ensemble_NN.forward`` ``model_ensemble.py:57-67``):

* **NN** — raw logits;
* **SVI BNN** — average of per-sample **softmax probabilities** over
  ``n_samples`` reparameterized guide draws (the guide returns softmax,
  ``model_bnn.py:134-136``; draws are stacked and meaned,
  ``model_bnn.py:257``). With ``seeds`` the draws are keyed per-seed so the
  same seed always yields the same weights (``model_bnn.py:222-226``);
* **SVI avg_posterior** — plug the variational means into the network and
  return **raw logits** (``model_bnn.py:206-216``);
* **HMC BNN** — index the stacked posterior by ``seeds`` (default
  ``range(n_samples)``, ``model_bnn.py:248-249``), softmax each sample's
  logits, average (``model_bnn.py:243-257``);
* **Ensemble** — mean of **raw logits** over the first ``n_samples`` members
  (``model_ensemble.py:63-67``) — deliberately asymmetric with the BNN's
  probability averaging; kept faithfully because attack gradients differ.

The reference loops Python-side over samples, re-running the network once per
draw (``model_bnn.py:230-232``); here the sample axis is a ``vmap``, so S draws
share one batched program on the MXU, and the per-draw weights for SVI are
generated on the fly from ``(loc, rho, key)`` — no S weight copies in HBM.

All predictive functions are pure and jittable; the ``forward`` methods on the
model classes are thin conveniences over them.
"""
from __future__ import annotations


from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from robustbnns_tpu.inference.svi import MeanFieldPosterior, sample_meanfield
from robustbnns_tpu.models.architectures import Architecture, Params
from robustbnns_tpu.utils.prng import keys_from_seeds
from robustbnns_tpu.utils.pytree import index_tree


def nn_predict(arch: Architecture, params: Params, x: jax.Array) -> jax.Array:
    """Deterministic forward: raw logits (reference ``model_nn.py:126-141``)."""
    return arch.apply(params, x)


def svi_predict(
    arch: Architecture,
    posterior: MeanFieldPosterior,
    x: jax.Array,
    sample_keys: jax.Array,
) -> jax.Array:
    """Mean softmax over one reparameterized draw per key — ``(batch, classes)``.

    ``sample_keys`` is a stacked ``(S,)`` key array: pass
    ``jax.random.split(key, S)`` for fresh draws or
    ``keys_from_seeds(seeds)`` for the reference's seeded repeatable draws.
    """

    def one(k):
        w = sample_meanfield(posterior, k)
        return jax.nn.softmax(arch.apply(w, x), axis=-1)

    return jax.vmap(one)(sample_keys).mean(axis=0)


def svi_avg_posterior_predict(
    arch: Architecture, posterior: MeanFieldPosterior, x: jax.Array
) -> jax.Array:
    """Raw logits at the variational mean (reference ``model_bnn.py:206-216``)."""
    return arch.apply(posterior.loc, x)


def hmc_predict(
    arch: Architecture,
    stacked_params: Params,
    x: jax.Array,
    sample_idx: jax.Array,
) -> jax.Array:
    """Mean softmax over indexed posterior draws (reference ``model_bnn.py:243-257``)."""
    params = index_tree(stacked_params, sample_idx)
    probs = jax.vmap(
        lambda p: jax.nn.softmax(arch.apply(p, x), axis=-1)
    )(params)
    return probs.mean(axis=0)


def ensemble_predict(
    arch: Architecture,
    stacked_params: Params,
    x: jax.Array,
    n_samples: int,
) -> jax.Array:
    """Mean raw logits over the first n members (reference ``model_ensemble.py:63-67``)."""
    params = jax.tree_util.tree_map(lambda p: p[:n_samples], stacked_params)
    logits = jax.vmap(arch.apply, in_axes=(0, None))(params, x)
    return logits.mean(axis=0)


def attach_pure(closure, pure_fn, state):
    """Attach the (pure_fn, state) split to a predictive closure.

    ``pure_fn(state, x, key)`` must be a pure function closing over nothing
    heavy; ``state`` is the pytree of model arrays (posterior samples, member
    stacks, ...). Jitted consumers route ``state`` as a TRACED argument —
    without this, a closure capturing e.g. a 100-sample HMC posterior embeds
    ~760 MB of constants into every compiled program (observed to take the
    remote TPU compiler out entirely).
    """
    closure._rbnn_pure_fn = pure_fn
    closure._rbnn_state = state
    return closure


def split_pure(forward_fn):
    """Return ``(pure_fn, state)`` if attached, else ``(None, None)``."""
    return (
        getattr(forward_fn, "_rbnn_pure_fn", None),
        getattr(forward_fn, "_rbnn_state", None),
    )


@partial(jax.jit, static_argnames=("pure_fn",))
def _eval_scan_pure(pure_fn, state, xb, yb, mb, keys):
    """Scan batched forward + correct-count with model state as a traced arg."""

    def step(_, batch):
        bx, by, mask, k = batch
        out = pure_fn(state, bx, k)
        correct = jnp.sum((jnp.argmax(out, -1) == jnp.argmax(by, -1)) * mask)
        return None, (out, correct)

    _, (outs, cs) = jax.lax.scan(step, None, (xb, yb, mb, keys))
    return outs.reshape((-1,) + outs.shape[2:]), jnp.sum(cs)


@partial(jax.jit, static_argnames=("forward_fn",))
def _eval_scan(forward_fn, xb, yb, mb, keys):
    """Closure fallback (state captured as constants — fine for small models).

    Compiled once per closure object (model predictive closures are memoized
    precisely so this cache hits)."""

    def step(_, batch):
        bx, by, mask, k = batch
        out = forward_fn(bx, k)
        correct = jnp.sum((jnp.argmax(out, -1) == jnp.argmax(by, -1)) * mask)
        return None, (out, correct)

    _, (outs, cs) = jax.lax.scan(step, None, (xb, yb, mb, keys))
    return outs.reshape((-1,) + outs.shape[2:]), jnp.sum(cs)


def normalize_forward(forward_fn):
    """Wrap ``f(x)`` or ``f(x, key)`` into a uniform ``f(x, key)``, memoized."""
    if getattr(forward_fn, "_rbnn_takes_key", False):
        return forward_fn
    import inspect

    try:
        n_params = len(inspect.signature(forward_fn).parameters)
    except (TypeError, ValueError):
        # Un-introspectable callable (builtin/C partial): guessing an arity
        # would fail far from the cause — demand an explicit marker instead.
        raise TypeError(
            f"cannot introspect {forward_fn!r}: wrap it in a Python function "
            "f(x) / f(x, key), or set forward_fn._rbnn_takes_key = True if it "
            "accepts (x, key)"
        )
    if n_params >= 2:
        try:  # memoization marker only — some callables reject attributes
            forward_fn._rbnn_takes_key = True
        except AttributeError:
            pass
        return forward_fn
    if not hasattr(forward_fn, "_rbnn_wrapped"):
        wrapped = lambda x, key: forward_fn(x)
        wrapped._rbnn_takes_key = True
        try:
            forward_fn._rbnn_wrapped = wrapped
        except AttributeError:
            return wrapped
    return forward_fn._rbnn_wrapped


def batched_eval(forward_fn, x, y, *, batch_size: int = 128, key=None, mesh=None):
    """Evaluate a predictive closure over a whole set as one jitted dispatch.

    Returns ``(outputs, correct_count)`` with ``outputs`` truncated to the real
    rows. Shared by model ``evaluate`` methods and ``attack_evaluation``.
    With ``mesh`` (or a process default) the within-batch row axis shards over
    the mesh's ``data`` axis and the model state replicates.
    """
    from robustbnns_tpu.data.loaders import batch_arrays

    fn = normalize_forward(forward_fn)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    key = key if key is not None else jax.random.key(0)
    xb, yb, mb = batch_arrays(x, y, batch_size)
    keys = jax.random.split(key, xb.shape[0])
    pure_fn, state = split_pure(forward_fn)

    from robustbnns_tpu.parallel.mesh import replicate, resolve_mesh, shard_axis

    mesh = resolve_mesh(mesh)
    if mesh is not None:
        # (num_batches, batch, ...): shard the row axis (1), scan axis stays.
        xb = shard_axis(xb, mesh, 1, "data")
        yb = shard_axis(yb, mesh, 1, "data")
        mb = shard_axis(mb, mesh, 1, "data")
        if state is not None:
            state = replicate(state, mesh)

    if pure_fn is not None:
        outs, correct = _eval_scan_pure(pure_fn, state, xb, yb, mb, keys)
    else:
        outs, correct = _eval_scan(fn, xb, yb, mb, keys)
    return outs[: x.shape[0]], correct


def resolve_sample_keys(
    n_samples: int,
    key: Optional[jax.Array],
    seeds: Optional[Sequence[int]],
) -> jax.Array:
    """The reference's seeds-vs-fresh-draws rule (``model_bnn.py:198-232``)."""
    if seeds is not None:
        seeds = list(seeds)
        if len(seeds) != n_samples:
            raise ValueError("Number of seeds should match number of samples.")
        return keys_from_seeds(seeds)
    if key is None:
        raise ValueError("pass either `key` (fresh draws) or `seeds`")
    return jax.random.split(key, n_samples)
