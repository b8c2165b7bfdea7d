"""Posterior-multimodality experiment CLI (reference ``test_multimodal.py``)."""
from __future__ import annotations

import argparse
import dataclasses
import os

import pandas as pd

from robustbnns_tpu.cli.common import boolean, setup_device
from robustbnns_tpu.config import DATA, multimodal_BNNs


def main(args):
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.experiments.multimodal import (
        build_multimodal_df,
        plot_multimodal_kde,
    )

    cfg = multimodal_BNNs[f"model_{args.model_idx}"]
    cfg = dataclasses.replace(cfg, n_samples=args.n_samples)

    n_inputs_list = [100] if args.debug else [1000, 10000, 60000]  # reference :33
    rel_path = DATA if not args.debug else os.path.join(DATA, "debug/")

    plot_filename = f"{cfg.dataset}_{cfg.architecture}_{cfg.inference}"
    plot_filename += "_samePCA" if args.same_pca else "_sepPCA"

    csv_dir = os.path.join(rel_path, cfg.name())
    csv_path = os.path.join(csv_dir, plot_filename + ".csv")

    if args.plot_only and os.path.exists(csv_path):
        df = pd.read_csv(csv_path, index_col=0)
    else:
        df = build_multimodal_df(
            cfg,
            n_inputs_list,
            n_samples=args.n_samples,
            rel_path=rel_path,
            train=not args.load_model,
            same_pca=args.same_pca,
            hmc_sampler=getattr(args, "hmc_sampler", "hmc"),
            hmc_init=getattr(args, "hmc_init", "random"),
        )
        os.makedirs(csv_dir, exist_ok=True)
        df.to_csv(csv_path)

    plot_multimodal_kde(df, n_inputs_list, plot_filename)
    return df


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_idx", default=10, type=int, help="10, 11 (HMC only)")
    parser.add_argument("--n_samples", default=50, type=int)
    parser.add_argument("--load_model", default=False, type=boolean)
    parser.add_argument("--plot_only", default=False, type=boolean)
    parser.add_argument("--same_pca", default=False, type=boolean)
    parser.add_argument("--debug", default=False, type=boolean)
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("--hmc_sampler", default="hmc", type=str, help="hmc, nuts")
    parser.add_argument("--hmc_init", default="random", type=str, help="random, map")
    main(parser.parse_args())
