"""Gradient components stripplot + vanishing-gradient heatmaps
(reference ``plot_gradients_components.py`` main, ``:144-179``).
"""
from __future__ import annotations

import argparse

from robustbnns_tpu.cli.common import add_common_flags, boolean, load_data, setup_device
from robustbnns_tpu.config import PLOTS, resolve_rel_path, saved_BNNs


def _get_gradients(args, bnn, x_test, y_test, n_samples_list, rel_path):
    from robustbnns_tpu.analysis import load_loss_gradients, loss_gradients

    out = []
    for posterior_samples in n_samples_list:
        if args.compute_grads:
            grads = loss_gradients(
                bnn, x_test, y_test, n_samples=posterior_samples,
                filename=bnn.name, savedir=bnn.name, rel_path=rel_path,
            )
        else:
            grads = load_loss_gradients(
                posterior_samples, bnn.name, bnn.name, rel_path
            )
        out.append(grads)
    return out


def main(args):
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.experiments.gradients_figures import (
        stripplot_gradients_components,
        vanishing_gradients_heatmaps,
    )
    from robustbnns_tpu.models import BNN

    cfg = saved_BNNs[f"model_{args.model_idx}"]
    rel_path = resolve_rel_path(args.savedir)

    _, _, x_test, y_test, inp_shape, out_size = load_data(
        cfg.dataset, args.n_inputs, shuffle=False
    )
    bnn = BNN.from_config(cfg, inp_shape, out_size).load(rel_path=rel_path)

    if args.stripplot:
        n_samples_list = [1, 10, 50, 100]  # reference :168
        grads = _get_gradients(args, bnn, x_test, y_test, n_samples_list, rel_path)
        stripplot_gradients_components(
            grads, n_samples_list, cfg.dataset, bnn.name, plots_dir=PLOTS
        )

    if args.heatmaps:
        n_samples_list = [1, 10, 100]  # reference :175
        args.compute_grads = False  # reference :176 loads precomputed
        grads = _get_gradients(args, bnn, x_test, y_test, n_samples_list, rel_path)
        vanishing_gradients_heatmaps(
            x_test, grads, n_samples_list, bnn.name, plots_dir=PLOTS
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    add_common_flags(parser, n_inputs_default=1000)
    parser.add_argument("--compute_grads", default=False, type=boolean)
    parser.add_argument("--stripplot", default=True, type=boolean)
    parser.add_argument("--heatmaps", default=True, type=boolean)
    main(parser.parse_args())
