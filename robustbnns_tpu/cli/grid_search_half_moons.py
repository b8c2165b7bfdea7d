"""Half Moons grid search CLI (reference ``grid_search_halfMoons.py`` main, ``:155-199``).

Default sweep matches the reference (``:157-169``); ``--quick`` shrinks it for
smoke runs. Multi-host fan-out via ``--host_id/--n_hosts`` replaces joblib.
"""
from __future__ import annotations

import argparse

from robustbnns_tpu.cli.common import boolean, setup_device
from robustbnns_tpu.config import resolve_rel_path


def main(args):
    setup_device(args.device, getattr(args, "mesh", None))

    from robustbnns_tpu.experiments.grid_search import (
        grid_attack,
        grid_cells_for_host,
        grid_combinations,
        grid_compute_grads,
        grid_train,
    )

    if args.quick:
        sweep = dict(
            hidden_size=[32], activation=["leaky"], architecture=["fc2"],
            inference=["hmc"], epochs=[None], lr=[None],
            n_samples=[10], warmup=[10], n_inputs=[200],
        )
        posterior_samples = [10]
    else:
        # reference settings :157-169
        sweep = dict(
            hidden_size=[32, 128, 256, 512], activation=["leaky"],
            architecture=["fc2"], inference=["hmc"], epochs=[None], lr=[None],
            n_samples=[250], warmup=[100, 200, 500],
            n_inputs=[5000, 10000, 15000],
        )
        posterior_samples = [250]

    from robustbnns_tpu.parallel import host_identity, initialize_distributed

    # Multi-host: connect to a JAX distributed runtime when configured
    # (coordinator env vars / TPU pod metadata); otherwise fall back to
    # --host_id/--n_hosts or ROBUSTBNNS_HOST_ID/ROBUSTBNNS_N_HOSTS.
    initialize_distributed()
    host_id, n_hosts = host_identity(args.host_id, args.n_hosts)

    rel_path = resolve_rel_path(args.savedir)
    cells = grid_cells_for_host(grid_combinations(**sweep), host_id, n_hosts)
    print(f"grid: {len(cells)} cells on host {host_id}/{n_hosts}")

    grid_train(
        cells, rel_path, num_chains=args.num_chains,
        hmc_mode=args.hmc_mode, sampler=args.sampler,
    )
    if args.compute_grads:
        grid_compute_grads(cells, posterior_samples, args.test_points, rel_path)
    if args.compute_attacks:
        grid_attack(cells, posterior_samples, args.test_points, "fgsm", rel_path)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Grid search BNN model")
    parser.add_argument("--test_points", default=100, type=int)
    parser.add_argument("--savedir", default="DATA", type=str, help="DATA, TESTS")
    parser.add_argument("--device", default="tpu", type=str, help="cpu, cuda, tpu")
    parser.add_argument("--compute_grads", default=True, type=boolean)
    parser.add_argument("--compute_attacks", default=False, type=boolean)
    parser.add_argument("--quick", default=False, type=boolean)
    parser.add_argument("--num_chains", default=1, type=int)
    parser.add_argument(
        "--hmc_mode", default="faithful", type=str, help="faithful, full"
    )
    parser.add_argument("--sampler", default="hmc", type=str, help="hmc, nuts")
    parser.add_argument("--host_id", default=None, type=int)
    parser.add_argument("--n_hosts", default=None, type=int)
    main(parser.parse_args())
