"""Train/evaluate a deterministic NN (reference ``model_nn.py`` main, ``:241-277``).

Example::

    python -m robustbnns_tpu.cli.train_nn --n_inputs=10 --model_idx=0 \
        --train=True --test=True --savedir=TESTS --device=cpu
"""
from __future__ import annotations

import argparse

from robustbnns_tpu.cli.common import add_common_flags, load_data, setup_device
from robustbnns_tpu.config import resolve_rel_path, saved_NNs


def main(args) -> float | None:
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.models import build_architecture, evaluate_nn, train_nn
    from robustbnns_tpu.models.nn import DeterministicNN

    cfg = saved_NNs[f"model_{args.model_idx}"]
    rel_path = resolve_rel_path(args.savedir)

    x_train, y_train, x_test, y_test, inp_shape, out_size = load_data(
        cfg.dataset, args.n_inputs
    )
    arch = build_architecture(
        cfg.architecture, cfg.activation, inp_shape, out_size, cfg.hidden_size,
        cfg.dataset,
    )

    if args.train:
        print("\n == NN training ==")
        model = train_nn(
            arch,
            x_train,
            y_train,
            epochs=cfg.epochs,
            lr=cfg.lr,
            batch_size=64,
            name=cfg.name,
        )
        model.save(rel_path)
    else:
        import jax

        model = DeterministicNN(
            arch=arch, params=arch.init(jax.random.key(0)), name=cfg.name
        )
        model.load(rel_path)

    if args.test:
        return evaluate_nn(model, x_test, y_test)
    return None


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Base NN")
    add_common_flags(parser)
    main(parser.parse_args())
