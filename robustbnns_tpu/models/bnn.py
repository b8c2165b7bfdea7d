"""The BNN model: configuration + inference engines + posterior predictive.

Functional analogue of the reference's ``BNN(PyroModule)`` (``model_bnn.py:69``):
the model is a dataclass holding the architecture and the trained posterior
state — a :class:`MeanFieldPosterior` for SVI or a stacked ``(S, ...)``
parameter pytree for HMC — with ``train`` / ``forward`` / ``evaluate`` /
``save`` / ``load`` mirroring the reference surface.

The probabilistic model is the reference's exactly (``model_bnn.py:105-119``):
iid ``N(0,1)`` priors on every network parameter and a categorical likelihood
on the logits under a data plate. Its HMC potential is

    U(w) = 0.5·‖w‖² − Σ_i log softmax(f_w(x_i))[y_i]     (+ const)

computed on a flat parameter vector so leapfrog steps are fused vector ops.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from robustbnns_tpu.config import BNNConfig, TESTS, bnn_batch_size
from robustbnns_tpu.inference.hmc import hmc_train_batched
from robustbnns_tpu.inference.svi import MeanFieldPosterior, svi_train
from robustbnns_tpu.models.architectures import Architecture, build_architecture
from robustbnns_tpu.utils.checkpoint import load_pytree, save_pytree
from robustbnns_tpu.utils.pytree import flatten_tree_to_vector


@dataclasses.dataclass
class BNN:
    """A Bayesian neural network (SVI or HMC posterior over an architecture)."""

    config: BNNConfig
    arch: Architecture
    n_inputs: Optional[int] = None
    # Exactly one of these is set after training/loading:
    posterior: Optional[MeanFieldPosterior] = None  # SVI
    samples: Optional[object] = None  # HMC: stacked (S, ...) params pytree
    # Memoized predictive closures — one stable function object per
    # (n_samples, seeds, avg_posterior) so downstream jits cache across calls.
    _fn_cache: dict = dataclasses.field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------ #
    # construction / identity
    # ------------------------------------------------------------------ #

    @classmethod
    def from_config(
        cls,
        config: BNNConfig,
        input_shape,
        output_size: int,
        n_inputs: Optional[int] = None,
    ) -> "BNN":
        arch = build_architecture(
            config.architecture,
            config.activation,
            input_shape,
            output_size,
            config.hidden_size,
            dataset_name=config.dataset,
        )
        return cls(config=config, arch=arch, n_inputs=n_inputs)

    @property
    def name(self) -> str:
        """Checkpoint identity string (reference ``model_bnn.py:90-103``)."""
        return self.config.name(self.n_inputs)

    # ------------------------------------------------------------------ #
    # training
    # ------------------------------------------------------------------ #

    def train(
        self,
        x_train,
        y_train,
        *,
        batch_size: Optional[int] = None,
        seed: int = 0,
        hmc_mode: str = "faithful",
        hmc_init: str = "random",
        hmc_sampler: str = "hmc",
        num_chains: int = 1,
        train_acc_samples: int = 10,
        mesh=None,
        verbose: bool = True,
    ) -> "BNN":
        """Dispatch to the SVI or HMC engine (reference ``model_bnn.py:350-365``).

        ``mesh`` (or a process default, ``parallel.set_default_mesh``) runs the
        engine SPMD over the mesh: SVI shards the dataset over ``data``; HMC
        shards each batch's likelihood over ``data`` (every leapfrog gradient
        becomes a psum-reduced data-parallel forward/backward over ICI).
        """
        from robustbnns_tpu.parallel.mesh import replicate, resolve_mesh, shard_axis

        mesh = resolve_mesh(mesh)
        self._fn_cache.clear()  # cached closures hold the previous state
        batch_size = batch_size or bnn_batch_size(self.config)

        if self.config.inference == "svi":
            self.posterior, self.history = svi_train(
                self.arch,
                x_train,
                y_train,
                epochs=self.config.epochs,
                lr=self.config.lr,
                batch_size=batch_size,
                seed=seed,
                train_acc_samples=train_acc_samples,
                mesh=mesh,
                verbose=verbose,
            )
            return self

        if self.config.inference == "hmc":
            template = self.arch.init(jax.random.key(seed))
            flat0, unravel = flatten_tree_to_vector(template)

            x = jnp.asarray(x_train)
            labels = jnp.argmax(jnp.asarray(y_train), axis=-1)

            def potential_fn(q, bx, blabels):
                params = unravel(q)
                logits = self.arch.apply(params, bx)
                logp = jax.nn.log_softmax(logits, axis=-1)
                loglik = jnp.sum(
                    jnp.take_along_axis(logp, blabels[:, None], axis=-1)
                )
                log_prior = -0.5 * jnp.sum(q * q)
                return -(log_prior + loglik)

            if hmc_init == "map":
                # Warm-start at a MAP-ish point (Adam on the full-data
                # potential) — see inference.hmc.map_warm_start. Opt-in: the
                # reference starts from the module's random init.
                from robustbnns_tpu.inference.hmc import map_warm_start

                flat0, _ = map_warm_start(potential_fn, flat0, data=(x, labels))
            elif hmc_init != "random":
                raise ValueError(f"unknown hmc_init {hmc_init!r}")

            # Reference batching: sequential full batches of `batch_size`
            # (model_bnn.py:274-277); the ragged tail batch is included.
            nb = -(-x.shape[0] // batch_size)
            batches = [
                (
                    x[i * batch_size : (i + 1) * batch_size],
                    labels[i * batch_size : (i + 1) * batch_size],
                )
                for i in range(nb)
            ]
            if mesh is not None:
                flat0 = replicate(flat0, mesh)
                batches = [
                    (
                        shard_axis(bx, mesh, 0, "data"),
                        shard_axis(bl, mesh, 0, "data"),
                    )
                    for bx, bl in batches
                ]

            flat_samples, self.hmc_info = hmc_train_batched(
                potential_fn,
                batches,
                flat0,
                jax.random.key(seed),
                n_samples=self.config.n_samples,
                warmup=self.config.warmup,
                step_size=self.config.step_size,
                num_steps=self.config.num_steps,
                mode=hmc_mode,
                num_chains=num_chains,
                sampler=hmc_sampler,
                verbose=verbose,
            )
            if num_chains > 1:
                # Merge chains into one stacked sample axis.
                flat_samples = flat_samples.reshape(-1, flat_samples.shape[-1])
            self.samples = jax.vmap(unravel)(flat_samples)
            return self

        raise ValueError(f"unknown inference {self.config.inference!r}")

    # ------------------------------------------------------------------ #
    # posterior predictive (reference model_bnn.py:198-258)
    # ------------------------------------------------------------------ #

    def forward(
        self,
        x: jax.Array,
        n_samples: Optional[int] = 10,
        *,
        key: Optional[jax.Array] = None,
        seeds: Optional[Sequence[int]] = None,
        avg_posterior: bool = False,
    ) -> jax.Array:
        """Averaged softmax probabilities (or raw logits for ``avg_posterior``).

        ``avg_posterior`` applies to SVI only; for HMC it is ignored exactly as
        the reference ignores it in its HMC branch (``model_bnn.py:243-255``).

        ``n_samples=None`` means the reference's default of 10 — the duck-typed
        attack/eval drivers pass ``None`` for "model's own default"
        (``adversarialAttacks.py:111`` accepts it for deterministic models).
        """
        if n_samples is None:
            n_samples = 10
        # Imported here (not at module top) to keep `import robustbnns_tpu.predict`
        # usable as a first import — predict pulls in models.architectures, and a
        # top-level import back into predict would close an import cycle.
        from robustbnns_tpu.predict import (
            hmc_predict,
            resolve_sample_keys,
            svi_avg_posterior_predict,
            svi_predict,
        )

        if self.config.inference == "svi":
            if self.posterior is None:
                raise ValueError("train() or load() the BNN first")
            if avg_posterior:
                return svi_avg_posterior_predict(self.arch, self.posterior, x)
            sample_keys = resolve_sample_keys(n_samples, key, seeds)
            return svi_predict(self.arch, self.posterior, x, sample_keys)

        if self.samples is None:
            raise ValueError("train() or load() the BNN first")
        if seeds is None:
            seeds = list(range(n_samples))  # reference model_bnn.py:248-249
        elif len(seeds) != n_samples:
            raise ValueError("Number of seeds should match number of samples.")
        idx = jnp.asarray(seeds, dtype=jnp.int32)
        return hmc_predict(self.arch, self.samples, x, idx)

    def evaluate(
        self,
        x_test,
        y_test,
        *,
        n_samples: int = 10,
        seeds: Optional[Sequence[int]] = None,
        batch_size: int = 128,
        verbose: bool = True,
    ) -> float:
        """Posterior-predictive accuracy in percent (reference ``model_bnn.py:367-391``).

        Defaults to seeded draws ``range(n_samples)`` like the reference
        (``model_bnn.py:376``), so repeated evaluations are identical.
        """
        if seeds is None:
            seeds = list(range(n_samples))
        from robustbnns_tpu.predict import batched_eval

        forward = self.predictive_fn(n_samples=n_samples, seeds=seeds)
        _, correct = batched_eval(forward, x_test, y_test, batch_size=batch_size)
        accuracy = 100.0 * float(correct) / len(x_test)
        if verbose:
            print("Accuracy: %.2f%%" % accuracy)
        return accuracy

    def predictive_fn(
        self,
        n_samples: Optional[int] = 10,
        *,
        seeds: Optional[Sequence[int]] = None,
        avg_posterior: bool = False,
        fused: bool = False,
    ):
        """A pure ``f(x[, key]) -> outputs`` closure for attacks/analysis.

        With ``seeds`` (or ``avg_posterior``) the closure is ``f(x)`` —
        deterministic. Without, it is ``f(x, key)`` and re-samples the
        posterior per call, matching the reference's attack-time behaviour
        (fresh guide traces every PGD iteration, ``adversarialAttacks.py:97``).

        Closures are memoized so repeated calls return the SAME function
        object — jitted consumers (attacks, evaluation) that key their cache on
        the closure then compile once per configuration, not once per call.

        ``fused=True`` (SVI + fc/fc2 only, fresh-draw mode) routes through the
        Pallas fused sampled-dense kernels — the TPU throughput path for
        Bayesian attacks; draws come from the in-kernel PRNG stream (same
        distribution, different stream than the XLA path).

        ``n_samples=None`` means the reference's default of 10 (see
        :meth:`forward`) — so duck-typed drivers that pass ``None`` for
        deterministic models work unchanged on BNNs.
        """
        if n_samples is None:
            n_samples = 10
        if self.config.inference == "hmc" and seeds is None and not avg_posterior:
            seeds = list(range(n_samples))
        if fused:
            if self.config.inference != "svi" or avg_posterior or seeds is not None:
                raise ValueError(
                    "fused predictive supports SVI fresh-draw mode only"
                )
            from robustbnns_tpu.ops import fused_predictive_fn, supports_fused

            if not supports_fused(self.arch):
                raise NotImplementedError(
                    "fused predictive supports fc/fc2 architectures"
                )
            cache_key = ("fused", n_samples)
            if cache_key not in self._fn_cache:
                self._fn_cache[cache_key] = fused_predictive_fn(
                    self.arch, self.posterior, n_samples
                )
            return self._fn_cache[cache_key]
        cache_key = (
            n_samples,
            tuple(seeds) if seeds is not None else None,
            bool(avg_posterior),
        )
        if cache_key in self._fn_cache:
            return self._fn_cache[cache_key]

        # Every closure also carries a (pure_fn, state) split so jitted
        # consumers can route the (possibly huge) posterior as a TRACED
        # argument instead of a baked-in constant — a 100-sample HMC posterior
        # as constants is ~100× the parameter count in the compile payload.
        from robustbnns_tpu.predict import (
            attach_pure,
            hmc_predict,
            svi_predict,
        )
        from robustbnns_tpu.utils.prng import keys_from_seeds

        apply = self.arch.apply
        if avg_posterior:
            fn = lambda x: self.forward(x, n_samples, avg_posterior=True)
            attach_pure(
                fn,
                lambda state, x, key: apply(state[0], x),
                (self.posterior.loc,),
            )
        elif self.config.inference == "hmc":
            seeds_list = list(seeds)
            fn = lambda x: self.forward(x, n_samples, seeds=seeds_list)
            idx = jnp.asarray(seeds_list, dtype=jnp.int32)

            def hmc_pure(state, x, key):
                samples, idx = state
                return hmc_predict(self.arch, samples, x, idx)

            attach_pure(fn, hmc_pure, (self.samples, idx))
        elif seeds is not None:
            seeds_list = list(seeds)
            fn = lambda x: self.forward(x, n_samples, seeds=seeds_list)
            sample_keys = keys_from_seeds(seeds_list)

            def svi_seeded_pure(state, x, key):
                posterior, sample_keys = state
                return svi_predict(self.arch, posterior, x, sample_keys)

            attach_pure(fn, svi_seeded_pure, (self.posterior, sample_keys))
        else:
            fn = lambda x, key: self.forward(x, n_samples, key=key)

            def svi_fresh_pure(state, x, key):
                (posterior,) = state
                return svi_predict(
                    self.arch, posterior, x, jax.random.split(key, n_samples)
                )

            attach_pure(fn, svi_fresh_pure, (self.posterior,))
        self._fn_cache[cache_key] = fn
        return fn

    # ------------------------------------------------------------------ #
    # persistence (reference model_bnn.py:138-196)
    # ------------------------------------------------------------------ #

    def _ckpt_path(self, rel_path: str, filename: Optional[str]) -> str:
        filename = filename or (self.name + "_weights")
        return os.path.join(rel_path, self.name, filename)

    def save(self, rel_path: str = TESTS, filename: Optional[str] = None) -> str:
        state = self.posterior if self.config.inference == "svi" else self.samples
        if state is None:
            raise ValueError("nothing to save — train() first")
        path = save_pytree(
            state,
            self._ckpt_path(rel_path, filename),
            meta={"name": self.name, "inference": self.config.inference},
        )
        print(f"\nSaving {path}")
        return path

    def load(self, rel_path: str = TESTS, filename: Optional[str] = None) -> "BNN":
        self._fn_cache.clear()  # cached closures hold the previous state
        path = self._ckpt_path(rel_path, filename)
        template_params = self.arch.init(jax.random.key(0))
        if self.config.inference == "svi":
            template = MeanFieldPosterior(loc=template_params, rho=template_params)
            self.posterior = load_pytree(template, path)
        else:
            template = jax.tree_util.tree_map(
                lambda p: jnp.broadcast_to(p, (self.config.n_samples,) + p.shape),
                template_params,
            )
            self.samples = load_pytree(template, path)
        print(f"\nLoading {path}")
        return self
