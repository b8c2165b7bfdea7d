"""robustbnns_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for studying the
robustness of Bayesian Neural Networks to gradient-based adversarial attacks.

Re-designed from scratch with the capabilities of the reference Pyro/PyTorch
implementation of Carbone et al. 2020 ("Robustness of Bayesian Neural Networks to
Gradient-Based Attacks", reference repo `ginevracoal/robustBNNs`), but built
TPU-first:

* params are pytrees, networks are pure ``apply(params, x)`` functions
  (vs the reference's ``nn.Module``/``PyroModule`` hierarchy);
* posterior samples / ensemble members are a leading ``vmap`` axis over a stacked
  weight pytree (vs the reference's per-sample ``deepcopy`` of whole modules,
  reference ``model_bnn.py:279-294``);
* SVI is a jitted reparameterized mean-field ELBO step, HMC is a jitted
  ``lax.scan`` leapfrog integrator with vmapped chains (vs Pyro's effect-handler
  tracing machinery);
* FGSM/PGD attacks are ``lax.scan`` loops vmapped over test points and shardable
  over a TPU mesh with ``shard_map`` (vs the reference's one-image-at-a-time
  Python loop, ``adversarialAttacks.py:118``).

Layout:

* :mod:`robustbnns_tpu.config` — output paths + the model zoos.
* :mod:`robustbnns_tpu.data` — dataset loading/preprocessing (MNIST, Fashion-MNIST,
  CIFAR-10, Half Moons) with the reference's exact normalization.
* :mod:`robustbnns_tpu.models` — the four architectures (fc/fc2/conv/conv2),
  deterministic NN training, ensembles.
* :mod:`robustbnns_tpu.inference` — SVI (mean-field Gaussian) and HMC engines.
* :mod:`robustbnns_tpu.predict` — the unified posterior-predictive function that
  serves NN / BNN / ensemble models behind one interface.
* :mod:`robustbnns_tpu.attacks` — FGSM/PGD (classic + Bayesian) and robustness
  measures.
* :mod:`robustbnns_tpu.analysis` — expected loss gradients and vanishing-gradient
  detection.
* :mod:`robustbnns_tpu.ops` — Pallas TPU kernels for the hot compute paths.
* :mod:`robustbnns_tpu.parallel` — device meshes and sharding rules.
* :mod:`robustbnns_tpu.cli` — command-line entry points mirroring the reference's
  script surface.
"""

__version__ = "0.1.0"
