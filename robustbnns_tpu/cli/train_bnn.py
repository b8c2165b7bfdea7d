"""Train/evaluate a BNN (reference ``model_bnn.py`` main, ``:393-426``).

Example::

    python -m robustbnns_tpu.cli.train_bnn --n_inputs=10 --model_idx=0 \
        --train=True --test=True --savedir=TESTS --device=cpu
"""
from __future__ import annotations

import argparse

from robustbnns_tpu.cli.common import add_common_flags, load_data, setup_device
from robustbnns_tpu.config import bnn_batch_size, resolve_rel_path, saved_BNNs
from robustbnns_tpu.utils.plotting import plot_loss_accuracy


def main(args):
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.models import BNN

    cfg = saved_BNNs[f"model_{args.model_idx}"]
    rel_path = resolve_rel_path(args.savedir)
    batch_size = bnn_batch_size(cfg)

    x_train, y_train, x_test, y_test, inp_shape, out_size = load_data(
        cfg.dataset, args.n_inputs
    )

    bnn = BNN.from_config(cfg, inp_shape, out_size)

    if args.train:
        bnn.train(
            x_train,
            y_train,
            batch_size=batch_size,
            hmc_mode=getattr(args, "hmc_mode", "faithful"),
            hmc_init=getattr(args, "hmc_init", "random"),
            hmc_sampler=getattr(args, "hmc_sampler", "hmc"),
            num_chains=getattr(args, "num_chains", 1),
        )
        bnn.save(rel_path=rel_path)
        if cfg.inference == "svi":
            import os

            plot_loss_accuracy(
                bnn.history,
                os.path.join(rel_path, bnn.name, bnn.name + "_training.png"),
            )
    else:
        bnn.load(rel_path=rel_path)

    if args.test:
        test_samples = 10
        print("\n== Evaluate on test data ==\n")
        bnn.evaluate(x_test, y_test, n_samples=test_samples)

        print(f"\n== Evaluate the first {test_samples} posterior samples ==\n")
        for seed in range(test_samples):
            bnn.evaluate(x_test, y_test, n_samples=1, seeds=[seed])
    return bnn


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--hmc_mode", default="faithful", type=str,
                        help="faithful (per-batch mcmc.run), full (one chain)")
    parser.add_argument("--hmc_init", default="random", type=str,
                        help="random (reference), map (Adam warm start)")
    parser.add_argument("--hmc_sampler", default="hmc", type=str,
                        help="hmc (reference kernel), nuts")
    parser.add_argument("--num_chains", default=1, type=int)
    main(parser.parse_args())
