"""NN vs BNN vs ensemble baseline attacks
(reference ``plot_baseline_attacks.py`` main, ``:184-199``).

Requires trained checkpoints for the NN (``saved_NNs[idx]``), the BNN
(``saved_BNNs[idx]``) and a ``--ensemble_size``-member ensemble of the NN
architecture under ``--savedir``.
"""
from __future__ import annotations

import argparse

import jax

from robustbnns_tpu.cli.common import add_common_flags, boolean, load_data, setup_device
from robustbnns_tpu.config import (
    EnsembleConfig,
    resolve_rel_path,
    saved_BNNs,
    saved_NNs,
)


def main(args):
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.experiments.baseline import (
        build_baseline_attacks_df,
        lineplot_baseline_attacks,
        load_baseline_attacks_df,
        save_baseline_attacks_df,
    )
    from robustbnns_tpu.models import BNN, EnsembleNN, build_architecture
    from robustbnns_tpu.models.nn import DeterministicNN

    rel_path = resolve_rel_path(args.savedir)
    nn_cfg = saved_NNs[f"model_{args.model_idx}"]
    bnn_cfg = saved_BNNs[f"model_{args.model_idx}"]

    _, _, x_test, y_test, inp_shape, out_size = load_data(
        nn_cfg.dataset, args.n_inputs, shuffle=False
    )
    x_test, y_test = x_test[: args.n_inputs], y_test[: args.n_inputs]

    if args.attack:
        arch = build_architecture(
            nn_cfg.architecture, nn_cfg.activation, inp_shape, out_size,
            nn_cfg.hidden_size, nn_cfg.dataset,
        )
        nn = DeterministicNN(
            arch=arch, params=arch.init(jax.random.key(0)), name=nn_cfg.name
        ).load(rel_path)

        bnn = BNN.from_config(bnn_cfg, inp_shape, out_size).load(rel_path=rel_path)

        ens_cfg = EnsembleConfig(
            dataset=nn_cfg.dataset, hidden_size=nn_cfg.hidden_size,
            activation=nn_cfg.activation, architecture=nn_cfg.architecture,
            epochs=nn_cfg.epochs, lr=nn_cfg.lr, ensemble_size=args.ensemble_size,
        )
        ens_arch = build_architecture(
            ens_cfg.architecture, ens_cfg.activation, inp_shape, out_size,
            ens_cfg.hidden_size, ens_cfg.dataset,
        )
        ensemble = EnsembleNN(
            arch=ens_arch, stacked_params=None,
            ensemble_size=args.ensemble_size, name=ens_cfg.name,
        ).load(rel_path)

        ens_samples = tuple(
            s for s in (1, 50, 100) if s <= args.ensemble_size
        ) or (args.ensemble_size,)
        defence = tuple(s for s in (1, 50, 100))
        df = build_baseline_attacks_df(
            nn, bnn, ensemble, x_test, y_test,
            attack_method=args.attack_method,
            bayesian_defence_samples=defence,
            ensemble_samples=ens_samples,
            rel_path=rel_path,
        )
        save_baseline_attacks_df(df, nn_cfg.dataset, args.attack_method)
    else:
        df = load_baseline_attacks_df(nn_cfg.dataset, args.attack_method)

    lineplot_baseline_attacks(
        df, nn_cfg.dataset, args.attack_method, args.n_inputs
    )
    return df


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    add_common_flags(parser, n_inputs_default=1000)
    parser.add_argument("--attack", default=True, type=boolean)
    parser.add_argument("--attack_method", default="fgsm", type=str)
    parser.add_argument("--ensemble_size", default=100, type=int)
    main(parser.parse_args())
