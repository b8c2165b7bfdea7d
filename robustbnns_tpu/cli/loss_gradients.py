"""Expected loss gradients over increasing sample counts
(reference ``lossGradients.py`` main, ``:130-151``).

Example::

    python -m robustbnns_tpu.cli.loss_gradients --n_inputs=10 --model_idx=0 \
        --device=cpu
"""
from __future__ import annotations

import argparse

from robustbnns_tpu.cli.common import add_common_flags, load_data, setup_device
from robustbnns_tpu.config import resolve_rel_path, saved_BNNs


def main(args):
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.analysis import loss_gradients
    from robustbnns_tpu.models import BNN

    posterior_samples_list = [1, 10, 50, 100]  # reference :132

    cfg = saved_BNNs[f"model_{args.model_idx}"]
    rel_path = resolve_rel_path(args.savedir)

    _, _, x_test, y_test, inp_shape, out_size = load_data(
        cfg.dataset, args.n_inputs
    )
    bnn = BNN.from_config(cfg, inp_shape, out_size).load(rel_path=rel_path)

    out = {}
    for posterior_samples in posterior_samples_list:
        out[posterior_samples] = loss_gradients(
            bnn,
            x_test,
            y_test,
            n_samples=posterior_samples,
            filename=bnn.name,
            savedir=bnn.name,
            rel_path=rel_path,
        )
    return out


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    add_common_flags(parser, n_inputs_default=1000)
    main(parser.parse_args())
