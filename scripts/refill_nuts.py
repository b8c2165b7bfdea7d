"""Refill the missing NUTS grid3 checkpoints and render the overparam figure.

Round-4 judging found `plots/overparam_nuts/` empty: a disk cleanup in an
earlier round removed the per-cell checkpoints under ``data/grid_nuts/``
(and all of faithful/full — whose figures were rendered before the cleanup
and survive as PNGs), so when grid3 finished its last h=512 cells the final
figure pass failed with FileNotFoundError on the first h=32 cell.

This driver retrains ONLY the NUTS cells whose checkpoint is missing
(identical engine + seed to ``scripts/grid3.py``: full-data NUTS, seed=0,
windowed warmup, chunked dispatches), saves checkpoint + S=250 expected
gradients, cross-checks the retrained test accuracy against the cell's
existing ``data/grid3_summary.csv`` row (which is NOT rewritten), and then
renders ``plots/overparam_nuts/halfMoons_final_hmc_100.png`` — the
reference figure ``plot_halfMoons_overparam.py:81-144`` for the best-mixed
posterior variant.

Restart-safe: cells with checkpoint + gradients on disk are skipped.

Run (TPU, ~2h — background): ``python -u scripts/refill_nuts.py > refill.log 2>&1``
Shakeout (CPU, ~1 min):      ``python scripts/refill_nuts.py --quick``
"""
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ROBUSTBNNS_DATA_FALLBACK", "synthetic")
os.environ.setdefault("ROBUSTBNNS_HMC_CHUNK", "100")
os.environ.setdefault("ROBUSTBNNS_NUTS_CHUNK", "10")
os.environ.setdefault("ROBUSTBNNS_MCMC_HEARTBEAT", "1")
# Match grid3.py: cells already refilled this round sampled at full-f32
# "highest" (the pre-round-5 default); keep relaunches consistent.
os.environ.setdefault("ROBUSTBNNS_MCMC_PRECISION", "highest")

import jax

QUICK = "--quick" in sys.argv
if QUICK:  # force CPU BEFORE anything initializes the backend (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

from robustbnns_tpu.config import DATA
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.experiments.grid_search import (
    grid_combinations,
    moons_batch_size,
    moons_config,
)
from robustbnns_tpu.models import BNN

if QUICK:
    SWEEP = dict(
        hidden_size=[16, 32], activation=["leaky"], architecture=["fc2"],
        inference=["hmc"], epochs=[None], lr=[None],
        n_samples=[10], warmup=[5], n_inputs=[200],
    )
    S, TEST_POINTS = 10, 20
    VDIR = os.path.join("tests_out", "refill_quick", "nuts")
    CSV_PATH = None  # no summary rows to cross-check in quick mode
else:
    SWEEP = dict(  # reference grid_search_halfMoons.py:157-169 (= grid3.py)
        hidden_size=[32, 128, 256, 512], activation=["leaky"],
        architecture=["fc2"], inference=["hmc"], epochs=[None], lr=[None],
        n_samples=[250], warmup=[100, 200, 500], n_inputs=[5000, 10000, 15000],
    )
    S, TEST_POINTS = 250, 100
    VDIR = os.path.join(DATA, "grid_nuts")
    CSV_PATH = os.path.join(DATA, "grid3_summary.csv")


def csv_acc(hidden, warmup, n_inputs):
    if CSV_PATH is None or not os.path.exists(CSV_PATH):
        return None
    with open(CSV_PATH) as f:
        for r in csv.DictReader(f):
            if (r["variant"] == "nuts" and int(r["hidden_size"]) == hidden
                    and int(r["warmup"]) == warmup
                    and int(r["n_inputs"]) == n_inputs):
                return float(r["test_acc"])
    return None


def sync_tree(tree) -> float:
    return sum(
        float(jnp.sum(leaf)) for leaf in jax.tree_util.tree_leaves(tree)
    )


def main():
    cells = grid_combinations(**SWEEP)
    _, _, xe, ye, inp_shape, out_size = load_dataset(
        "half_moons", n_inputs=TEST_POINTS
    )
    _, _, xg, yg, _, _ = load_dataset(  # grads set: shuffle=True (ref :72)
        "half_moons", n_inputs=TEST_POINTS, shuffle=True
    )
    os.makedirs(VDIR, exist_ok=True)
    t_start = time.time()

    from robustbnns_tpu.analysis import loss_gradients

    for cell in cells:
        *cfg_args, n_inputs = cell
        cfg = moons_config(*cfg_args)
        bnn = BNN.from_config(cfg, inp_shape, out_size, n_inputs=n_inputs)
        ckpt = os.path.join(VDIR, bnn.name, bnn.name + "_weights.npz")
        gpath = os.path.join(VDIR, bnn.name, f"{bnn.name}_samp={S}_lossGrads.npz")
        tag = f"h={cfg.hidden_size} w={cfg.warmup} n={n_inputs}"
        if os.path.exists(ckpt) and os.path.exists(gpath):
            print(f"[skip] {tag}: checkpoint + grads present", flush=True)
            continue
        try:
            if os.path.exists(ckpt):
                bnn.load(rel_path=VDIR)
                train_s = float("nan")
            else:
                x_train, y_train, *_ = load_dataset(
                    "half_moons", n_inputs=n_inputs, shuffle=False
                )
                t0 = time.perf_counter()
                bnn.train(
                    x_train, y_train,
                    batch_size=moons_batch_size(cfg.inference),
                    hmc_mode="full", hmc_sampler="nuts", seed=0, verbose=False,
                )
                sync_tree(bnn.samples)
                train_s = time.perf_counter() - t0
                bnn.save(rel_path=VDIR)
            acc = bnn.evaluate(xe, ye, n_samples=S, batch_size=64, verbose=False)
            ref_acc = csv_acc(cfg.hidden_size, cfg.warmup, n_inputs)
            delta = "" if ref_acc is None else f" (CSV {ref_acc:.1f}, Δ{acc - ref_acc:+.1f})"
            loss_gradients(
                bnn, xg, yg, n_samples=S, filename=bnn.name,
                savedir=bnn.name, rel_path=VDIR, verbose=False,
            )
            print(
                f"[{time.time() - t_start:7.0f}s] {tag}: train {train_s:.1f}s "
                f"acc {acc:.1f}%{delta}", flush=True,
            )
        except Exception as e:  # keep sweeping; restart-safe via disk state
            print(f"[FAIL] {tag}: {type(e).__name__}: {e}", flush=True)

    # ---- the figure --------------------------------------------------------
    from robustbnns_tpu.experiments.overparam import (
        build_overparam_scatterplot_dataset,
        overparam_scatterplot,
    )

    plots_dir = (os.path.join("tests_out", "refill_quick", "plots") if QUICK
                 else os.path.join("plots", "overparam_nuts"))
    df = build_overparam_scatterplot_dataset(
        cells, [S], TEST_POINTS, rel_path=VDIR, out_dir=VDIR, verbose=False,
    )
    png = overparam_scatterplot(
        df, SWEEP["hidden_size"], TEST_POINTS, plots_dir=plots_dir,
    )
    print(f"overparam[nuts] -> {png}", flush=True)
    print(f"REFILL total {time.time() - t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
