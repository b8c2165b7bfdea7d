"""Train/evaluate an NN ensemble (reference ``model_ensemble.py`` main, ``:109-146``).

All members train simultaneously as a vmapped axis (vs the reference's serial
per-seed loop).
"""
from __future__ import annotations

import argparse

from robustbnns_tpu.cli.common import add_common_flags, load_data, setup_device
from robustbnns_tpu.config import EnsembleConfig, resolve_rel_path, saved_NNs


def main(args):
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.models import EnsembleNN, build_architecture, train_ensemble

    nn_cfg = saved_NNs[f"model_{args.model_idx}"]
    cfg = EnsembleConfig(
        dataset=nn_cfg.dataset,
        hidden_size=nn_cfg.hidden_size,
        activation=nn_cfg.activation,
        architecture=nn_cfg.architecture,
        epochs=nn_cfg.epochs,
        lr=nn_cfg.lr,
        ensemble_size=args.ensemble_size,
    )
    rel_path = resolve_rel_path(args.savedir)

    x_train, y_train, x_test, y_test, inp_shape, out_size = load_data(
        cfg.dataset, args.n_inputs
    )
    arch = build_architecture(
        cfg.architecture, cfg.activation, inp_shape, out_size, cfg.hidden_size,
        cfg.dataset,
    )

    if args.train:
        model = train_ensemble(
            arch,
            x_train,
            y_train,
            ensemble_size=cfg.ensemble_size,
            epochs=cfg.epochs,
            lr=cfg.lr,
            batch_size=cfg.batch_size,
            name=cfg.name,
            member_chunk=getattr(args, "member_chunk", None),
        )
        model.save(rel_path)
    else:
        model = EnsembleNN(
            arch=arch,
            stacked_params=None,
            ensemble_size=cfg.ensemble_size,
            name=cfg.name,
        )
        model.load(rel_path)

    if args.test:
        return model.evaluate(
            x_test, y_test, n_samples=args.ensemble_size, batch_size=64
        )
    return None


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument(
        "--ensemble_size", default=100, type=int, help="size of the ensemble"
    )
    parser.add_argument(
        "--member_chunk", default=None, type=int,
        help="train members in chunks of this size (memory escape hatch)",
    )
    main(parser.parse_args())
