"""Command-line entry points mirroring the reference's script surface.

| reference script          | here                                        |
|---------------------------|---------------------------------------------|
| ``model_nn.py``           | ``python -m robustbnns_tpu.cli.train_nn``   |
| ``model_bnn.py``          | ``python -m robustbnns_tpu.cli.train_bnn``  |
| ``model_ensemble.py``     | ``python -m robustbnns_tpu.cli.train_ensemble`` |
| ``lossGradients.py``      | ``python -m robustbnns_tpu.cli.loss_gradients`` |
| ``adversarialAttacks.py`` | ``python -m robustbnns_tpu.cli.attacks``    |
| ``grid_search_halfMoons.py`` | ``python -m robustbnns_tpu.cli.grid_search_half_moons`` |
| ``plot_baseline_attacks.py`` | ``python -m robustbnns_tpu.cli.baseline_attacks`` |
| ``plot_eps_attacks.py``   | ``python -m robustbnns_tpu.cli.eps_attacks`` |
| ``plot_gradients_components.py`` | ``python -m robustbnns_tpu.cli.gradients_components`` |
| ``plot_halfMoons_overparam.py`` | ``python -m robustbnns_tpu.cli.overparam`` |
| ``test_multimodal.py``    | ``python -m robustbnns_tpu.cli.multimodal`` |
| ``test.sh``               | ``smoke_test.sh`` (repo root)               |

Flag vocabulary matches the reference (``--n_inputs/--model_idx/--train/--test/
--savedir/--device``, booleans parsed like the reference's ``type=eval``).
"""
