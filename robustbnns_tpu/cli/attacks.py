"""Attack trained models (reference ``adversarialAttacks.py`` main, ``:205-353``).

Example::

    python -m robustbnns_tpu.cli.attacks --model_type=bnn --model_idx=0 \
        --attack_method=fgsm --n_inputs=100 --device=cpu
"""
from __future__ import annotations

import argparse

import numpy as np

from robustbnns_tpu.cli.common import (
    add_common_flags,
    boolean,
    load_data,
    setup_device,
)
from robustbnns_tpu.config import (
    EnsembleConfig,
    resolve_rel_path,
    saved_BNNs,
    saved_NNs,
)

EPSILON = 0.3  # reference adversarialAttacks.py:207


def _build_nn(cfg, inp_shape, out_size, rel_path, args, x_train, y_train,
              x_test=None, y_test=None):
    import jax

    from robustbnns_tpu.models import build_architecture, evaluate_nn, train_nn
    from robustbnns_tpu.models.nn import DeterministicNN

    arch = build_architecture(
        cfg.architecture, cfg.activation, inp_shape, out_size, cfg.hidden_size,
        cfg.dataset,
    )
    if args.train:
        model = train_nn(
            arch, x_train, y_train, epochs=cfg.epochs, lr=cfg.lr, name=cfg.name
        )
        model.save(rel_path)
    else:
        model = DeterministicNN(
            arch=arch, params=arch.init(jax.random.key(0)), name=cfg.name
        )
        model.load(rel_path)
    if args.test:
        evaluate_nn(
            model,
            x_test if x_test is not None else x_train,
            y_test if y_test is not None else y_train,
        )
    return model


def main(args):
    if getattr(args, "bf16", False):
        # Opt-in bf16 MXU matmuls for the attack/eval forwards — the measured
        # win on large-contraction paths (PERFORMANCE.md "Scope of the bf16
        # knob"). Read per-call by the dense layers, so setting it here covers
        # every forward below.
        import os

        os.environ["ROBUSTBNNS_BF16"] = "1"
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.attacks import attack, attack_evaluation, load_attack
    from robustbnns_tpu.models import BNN, EnsembleNN

    rel_path = resolve_rel_path(args.savedir)

    if args.model_type == "nn":
        cfg = saved_NNs[f"model_{args.model_idx}"]
        x_train, y_train, x_test, y_test, inp_shape, out_size = load_data(
            cfg.dataset, None, shuffle=False
        )
        nn = _build_nn(
            cfg, inp_shape, out_size, rel_path, args, x_train, y_train,
            x_test, y_test,
        )
        x_test, y_test = x_test[: args.n_inputs], y_test[: args.n_inputs]
        if args.attack:
            x_attack = attack(
                nn, x_test, y_test, method=args.attack_method, epsilon=EPSILON,
                filename=cfg.name, rel_path=rel_path,
            )
        else:
            x_attack = load_attack(
                method=args.attack_method, filename=cfg.name, rel_path=rel_path
            )
        attack_evaluation(nn, x_test, x_attack, y_test)

    elif args.model_type == "bnn":
        bayesian_attack_samples = [10]  # reference :251
        bayesian_defence_samples = [10]  # reference :252
        cfg = saved_BNNs[f"model_{args.model_idx}"]
        x_train, y_train, x_test, y_test, inp_shape, out_size = load_data(
            cfg.dataset, None, shuffle=False
        )
        bnn = BNN.from_config(cfg, inp_shape, out_size)
        if args.train:
            bnn.train(x_train, y_train)
            bnn.save(rel_path=rel_path)
        else:
            bnn.load(rel_path=rel_path)
        if args.test:
            bnn.evaluate(x_test, y_test, n_samples=10)

        x_test, y_test = x_test[: args.n_inputs], y_test[: args.n_inputs]
        for attack_samples in bayesian_attack_samples:
            x_attack = attack(
                bnn, x_test, y_test, method=args.attack_method, epsilon=EPSILON,
                n_samples=attack_samples, fused=getattr(args, "fused", False),
                filename=bnn.name, rel_path=rel_path,
            )
            for defence_samples in bayesian_defence_samples:
                attack_evaluation(
                    bnn, x_test, x_attack, y_test, n_samples=defence_samples
                )

    elif args.model_type == "ensemble":
        ensemble_size = 10  # reference :327
        nn_cfg = saved_NNs[f"model_{args.model_idx}"]
        cfg = EnsembleConfig(
            dataset=nn_cfg.dataset, hidden_size=nn_cfg.hidden_size,
            activation=nn_cfg.activation, architecture=nn_cfg.architecture,
            epochs=nn_cfg.epochs, lr=nn_cfg.lr, ensemble_size=ensemble_size,
        )
        from robustbnns_tpu.models import build_architecture

        _, _, x_test, y_test, inp_shape, out_size = load_data(
            cfg.dataset, args.n_inputs, shuffle=False
        )
        arch = build_architecture(
            cfg.architecture, cfg.activation, inp_shape, out_size,
            cfg.hidden_size, cfg.dataset,
        )
        ens = EnsembleNN(
            arch=arch, stacked_params=None, ensemble_size=ensemble_size,
            name=cfg.name,
        ).load(rel_path)
        x_attack = attack(
            ens, x_test, y_test, method=args.attack_method, epsilon=EPSILON,
            filename=cfg.name, rel_path=rel_path,
        )
        attack_evaluation(ens, x_test, x_attack, y_test)

    else:
        raise NotImplementedError(args.model_type)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    add_common_flags(parser, n_inputs_default=1000)
    parser.add_argument(
        "--model_type", default="nn", type=str, help="nn, bnn, ensemble"
    )
    parser.add_argument("--attack", default=True, type=boolean)
    parser.add_argument(
        "--attack_method", default="fgsm", type=str, help="fgsm, pgd"
    )
    parser.add_argument(
        "--fused", default=False, type=boolean,
        help="route BNN attack forwards through the Pallas fused predictive "
             "(SVI + fc/fc2 only)",
    )
    parser.add_argument(
        "--bf16", default=False, type=boolean,
        help="bf16 MXU matmuls for all forwards (sets ROBUSTBNNS_BF16=1)",
    )
    main(parser.parse_args())
