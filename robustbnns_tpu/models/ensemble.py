"""NN ensembles as a vmapped member axis (reference ``model_ensemble.py``).

The reference trains ``ensemble_size`` independent NNs in a Python loop with
seeds ``0..E-1`` and stores one weight file per member
(``model_ensemble.py:69-83``); its forward pass averages **raw logits** over the
first ``n_samples`` members (``model_ensemble.py:57-67``) — note the asymmetry
with the BNN, which averages softmax *probabilities* (``model_bnn.py:257``).

TPU-first design: members live in ONE stacked parameter pytree with a leading
``(E, ...)`` axis. Training vmaps the whole per-member Adam step across the
member axis — all members train simultaneously, turning E small matmuls into one
batched matmul that actually fills the MXU. Member-parallelism can additionally
be sharded across TPU cores (see :mod:`robustbnns_tpu.parallel`).
"""
from __future__ import annotations

import dataclasses
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from robustbnns_tpu.data.loaders import batch_arrays
from robustbnns_tpu.models.architectures import Architecture, Params
from robustbnns_tpu.models.nn import cross_entropy
from robustbnns_tpu.utils.pytree import slice_tree
from robustbnns_tpu.utils.timing import execution_time


@dataclasses.dataclass
class EnsembleNN:
    """An ensemble: architecture + stacked ``(E, ...)`` parameter pytree."""

    arch: Architecture
    stacked_params: Params
    ensemble_size: int
    name: str | None = None  # checkpoint identity (reference model_ensemble.py:26)
    _fn_cache: dict = dataclasses.field(default_factory=dict, repr=False)

    def save(self, rel_path: str) -> str:
        """Persist all members as ONE stacked checkpoint under
        ``<name>/weights/`` (vs the reference's per-seed files,
        ``model_ensemble.py:33-55``)."""
        from robustbnns_tpu.utils.checkpoint import save_pytree

        if self.name is None:
            raise ValueError("set model.name before saving")
        path = save_pytree(
            self.stacked_params,
            os.path.join(rel_path, self.name, "weights", f"{self.name}_stacked"),
            meta={"ensemble_size": self.ensemble_size},
        )
        print("\nSaving: ", path)
        return path

    def load(self, rel_path: str):
        from robustbnns_tpu.utils.checkpoint import load_pytree

        if self.name is None:
            raise ValueError("set model.name before loading")
        template = (
            self.stacked_params
            if self.stacked_params is not None
            else jax.vmap(self.arch.init)(
                jax.vmap(jax.random.key)(
                    jnp.arange(self.ensemble_size, dtype=jnp.uint32)
                )
            )
        )
        path = os.path.join(rel_path, self.name, "weights", f"{self.name}_stacked")
        self.stacked_params = load_pytree(template, path)
        self._fn_cache.clear()  # cached closures hold the previous params
        print("\nLoading: ", path)
        return self

    def member_logits(self, x: jax.Array, n_samples: int | None = None) -> jax.Array:
        """Per-member logits ``(n, batch, classes)`` for the first n members."""
        n = self.ensemble_size if n_samples is None else n_samples
        if n > self.ensemble_size:
            raise ValueError(
                f"Maximum number of samples allowed is {self.ensemble_size}"
            )
        params_n = slice_tree(self.stacked_params, n)
        return jax.vmap(self.arch.apply, in_axes=(0, None))(params_n, x)

    def logits(self, x: jax.Array, n_samples: int | None = None) -> jax.Array:
        """Mean of raw member logits (reference ``model_ensemble.py:64-67``)."""
        return jnp.mean(self.member_logits(x, n_samples), axis=0)

    def forward(self, x: jax.Array, n_samples: int | None = None, **_ignored):
        """Duck-typed predictive surface: mean raw logits over n members."""
        return self.logits(x, n_samples)

    def predictive_fn(self, n_samples: int | None = None, **_ignored):
        """A pure ``f(x) -> mean logits`` closure for attacks/analysis.

        Memoized per member count so jitted consumers compile once.
        """
        n = self.ensemble_size if n_samples is None else n_samples
        if n > self.ensemble_size:
            raise ValueError(
                f"Maximum number of samples allowed is {self.ensemble_size}"
            )
        if n not in self._fn_cache:
            from robustbnns_tpu.predict import attach_pure

            params_n = slice_tree(self.stacked_params, n)
            apply = self.arch.apply
            fn = lambda x: jnp.mean(
                jax.vmap(apply, in_axes=(0, None))(params_n, x), axis=0
            )
            attach_pure(
                fn,
                lambda state, x, key: jnp.mean(
                    jax.vmap(apply, in_axes=(0, None))(state[0], x), axis=0
                ),
                (params_n,),
            )
            self._fn_cache[n] = fn
        return self._fn_cache[n]

    def evaluate(
        self, x_test, y_test, *, n_samples: int | None = None,
        batch_size: int = 64, verbose: bool = True,
    ) -> float:
        """Accuracy in percent (reference ``model_ensemble.py:85-106``)."""
        from robustbnns_tpu.predict import batched_eval

        fn = self.predictive_fn(n_samples)
        _, correct = batched_eval(fn, x_test, y_test, batch_size=batch_size)
        accuracy = 100.0 * float(correct) / len(x_test)
        if verbose:
            print("\nAccuracy: %.2f%%" % accuracy)
        return accuracy


@partial(jax.jit, static_argnames=("apply_fn", "optimizer", "batch_size"))
def _ensemble_epoch(apply_fn, optimizer, batch_size, params_e, opt_state_e, x, y, keys):
    """One epoch for ALL members in a single dispatch: vmap(member) ∘ scan(batches).

    ``params_e`` has a leading member axis; every member shuffles its own batch
    stream from its own key (reference ``model_ensemble.py:73-75`` reshuffles
    per member). The shared dataset ``x``/``y`` is gathered per member inside
    the jit — no per-member host work.
    """

    def one_member(params, opt_state, key):
        perm = jax.random.permutation(key, x.shape[0])
        xb, yb, mb = batch_arrays(x, y, batch_size, perm=perm)

        def step(carry, batch):
            params, opt_state = carry
            bx, by, mask = batch
            labels = jnp.argmax(by, axis=-1)

            def loss_fn(p):
                return cross_entropy(apply_fn(p, bx), labels, mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), (xb, yb, mb))
        return params, opt_state, jnp.sum(losses)

    return jax.vmap(one_member)(params_e, opt_state_e, keys)


def train_ensemble(
    arch: Architecture,
    x_train,
    y_train,
    *,
    ensemble_size: int,
    epochs: int,
    lr: float,
    batch_size: int = 100,
    name: str | None = None,
    mesh=None,
    member_chunk: int | None = None,
    verbose: bool = True,
) -> EnsembleNN:
    """Train all members simultaneously (vs the reference's serial loop).

    Member ``i`` is initialized from seed ``i`` and sees its own per-epoch
    shuffles, matching the reference's seeding scheme
    (``model_ensemble.py:71-81``, ``model_nn.py:182-188``) while running all
    members as one batched program.

    ``member_chunk`` is the memory escape hatch for big ensembles (the
    reference's CIFAR baseline uses 100 conv members,
    ``plot_baseline_attacks.py:89-90``): members train in independent chunks of
    that size, bounding live optimizer state to ``member_chunk`` members.
    Chunking never changes any member's numbers — members share nothing.

    With ``mesh`` (or a process default), each chunk's member axis shards over
    the mesh's ``sample`` axis (members are embarrassingly parallel — zero
    collectives) and the dataset replicates.
    """
    from robustbnns_tpu.parallel.mesh import replicate, resolve_mesh, shard_axis

    mesh = resolve_mesh(mesh)
    optimizer = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

    x = jnp.asarray(x_train)
    y = jnp.asarray(y_train)
    n = x.shape[0]
    if mesh is not None:
        x = replicate(x, mesh)
        y = replicate(y, mesh)

    def train_members(seed_lo: int, seed_hi: int):
        """Train members seed_lo..seed_hi-1; returns their stacked params."""
        member_keys = jax.vmap(jax.random.key)(
            jnp.arange(seed_lo, seed_hi, dtype=jnp.uint32)
        )
        init_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(member_keys)
        shuffle_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(member_keys)

        params_e = jax.vmap(arch.init)(init_keys)
        opt_state_e = jax.vmap(optimizer.init)(params_e)
        if mesh is not None:
            params_e = shard_axis_tree(params_e, mesh)
            opt_state_e = shard_axis_tree(opt_state_e, mesh)
            shuffle_keys = shard_axis(shuffle_keys, mesh, 0, "sample")

        for epoch in range(epochs):
            epoch_keys = jax.vmap(lambda k: jax.random.fold_in(k, epoch))(shuffle_keys)
            params_e, opt_state_e, losses = _ensemble_epoch(
                arch.apply, optimizer, batch_size, params_e, opt_state_e, x, y, epoch_keys
            )
            if verbose:
                # Stream as each epoch's dispatch completes (the float() is
                # the device sync) instead of after the whole training.
                label = (
                    f"[Ensemble epoch {epoch + 1}]"
                    if seed_lo == 0 and seed_hi == ensemble_size
                    else f"[Ensemble members {seed_lo}-{seed_hi - 1} epoch {epoch + 1}]"
                )
                print(
                    f"\n{label} mean member loss: "
                    f"{float(jnp.mean(losses)) / n:.6f}",
                    end="\t",
                    flush=True,
                )
        return params_e

    def shard_axis_tree(tree, mesh):
        return jax.tree_util.tree_map(
            lambda a: shard_axis(a, mesh, 0, "sample"), tree
        )

    start = time.time()
    chunk = member_chunk or ensemble_size
    chunks = []
    for lo in range(0, ensemble_size, chunk):
        params_c = train_members(lo, min(lo + chunk, ensemble_size))
        # Pull each finished chunk to host so chunking actually bounds HBM.
        if member_chunk is not None:
            params_c = jax.tree_util.tree_map(jax.device_get, params_c)
        chunks.append(params_c)
    if len(chunks) == 1:
        params_e = chunks[0]
    else:
        params_e = jax.tree_util.tree_map(
            lambda *leaves: jnp.concatenate(leaves, axis=0), *chunks
        )

    if verbose:
        execution_time(start=start, end=time.time())

    return EnsembleNN(
        arch=arch,
        stacked_params=params_e,
        ensemble_size=int(ensemble_size),
        name=name,
    )
