"""Overparametrized-limit figure CLI
(reference ``plot_halfMoons_overparam.py`` main, ``:147-179``).
"""
from __future__ import annotations

import argparse
import os

import pandas as pd

from robustbnns_tpu.cli.common import boolean, setup_device
from robustbnns_tpu.config import resolve_rel_path


def main(args):
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.experiments.grid_search import grid_combinations
    from robustbnns_tpu.experiments.overparam import (
        build_overparam_scatterplot_dataset,
        overparam_scatterplot,
    )

    rel_path = resolve_rel_path(args.savedir)

    if args.quick:
        sweep = dict(
            hidden_size=[32], activation=["leaky"], architecture=["fc2"],
            inference=["hmc"], epochs=[None], lr=[None],
            n_samples=[10], warmup=[10], n_inputs=[200],
        )
        hidden_size = [32]
        posterior_samples = [10]
    else:
        # reference settings :150-161
        sweep = dict(
            hidden_size=[32, 128, 256, 512], activation=["leaky"],
            architecture=["fc2"], inference=["hmc"], epochs=[None], lr=[None],
            n_samples=[250], warmup=[100, 200, 500],
            n_inputs=[5000, 10000, 15000],
        )
        hidden_size = [32, 128, 256, 512]
        posterior_samples = [10, 20, 50] if args.rebuild else [250]

    csv = os.path.join(rel_path, f"halfMoons_lossGrads_final_{args.test_points}.csv")
    if args.rebuild or not os.path.exists(csv):
        cells = grid_combinations(**sweep)
        df = build_overparam_scatterplot_dataset(
            cells, posterior_samples, args.test_points,
            rel_path=rel_path, out_dir=rel_path,
        )
    else:
        df = pd.read_csv(csv)

    overparam_scatterplot(df, hidden_size, args.test_points, orient="h")
    return df


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Toy example on half moons")
    parser.add_argument("--test_points", default=100, type=int)
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("--savedir", default="DATA", type=str)
    parser.add_argument("--rebuild", default=False, type=boolean)
    parser.add_argument("--quick", default=False, type=boolean)
    main(parser.parse_args())
