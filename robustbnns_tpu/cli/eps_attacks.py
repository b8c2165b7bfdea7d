"""BNN ε-sweep attacks (reference ``plot_eps_attacks.py`` main, ``:68-101``)."""
from __future__ import annotations

import argparse

from robustbnns_tpu.cli.common import add_common_flags, boolean, load_data, setup_device
from robustbnns_tpu.config import resolve_rel_path, saved_BNNs


def main(args):
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.experiments.eps import (
        build_eps_attacks_df,
        lineplot_increasing_eps,
        load_eps_attacks_df,
    )
    from robustbnns_tpu.models import BNN

    cfg = saved_BNNs[f"model_{args.model_idx}"]
    rel_path = resolve_rel_path(args.savedir)

    _, _, x_test, y_test, inp_shape, out_size = load_data(
        cfg.dataset, args.n_inputs, shuffle=False
    )
    bnn = BNN.from_config(cfg, inp_shape, out_size).load(rel_path=rel_path)

    if args.test:
        bnn.evaluate(x_test, y_test, n_samples=10)

    if args.attack:
        df = build_eps_attacks_df(
            bnn,
            x_test[: args.n_inputs],
            y_test[: args.n_inputs],
            dataset=cfg.dataset,
            method=args.attack_method,
            out_dir=rel_path,
        )
    else:
        df = load_eps_attacks_df(cfg.dataset, args.attack_method, bnn.name, rel_path)

    lineplot_increasing_eps(df, cfg.dataset, args.attack_method)
    return df


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    add_common_flags(parser, n_inputs_default=100)
    parser.add_argument("--attack", default=True, type=boolean)
    parser.add_argument("--attack_method", default="fgsm", type=str)
    main(parser.parse_args())
