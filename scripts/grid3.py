"""Round-3 grid study: properly-mixed posteriors vs the faithful engine.

VERDICT round-2 items #1 and #7: the faithful batched-HMC grid (reference
``grid_search_halfMoons.py:157-174`` semantics, Pyro 1.3.0 resample-with-
replacement) caps the posterior at ~18 distinct draws out of the nominal 250,
and the paper's "gradients shrink in the overparametrized limit" trend
(``plot_halfMoons_overparam.py:34-144``) did not emerge from it. This script
re-runs the SAME 36-cell grid with two properly-mixed engines and produces
the faithful-vs-idiomatic comparison:

* ``faithful`` — the reference's batched engine (round-3 fixed warmup);
* ``full``  — one proper full-data HMC chain per cell (``hmc_mode='full'``);
* ``nuts``  — full-data No-U-Turn chain per cell (beyond-reference engine).

All three retrain with the round-3 engine (windowed mass warmup + full-f32
sampler precision — the first grid run of this script EXPOSED the TPU
bf16-precision adaptation collapse; round-2 checkpoints under ``data/`` are
left untouched as artifacts of the old engine).

Outputs: checkpoints + S=250 expected gradients under ``data/grid_<variant>/``;
per-cell summary CSV ``data/grid3_summary.csv`` (variant, cell, train seconds,
accuracy, accept rate, adapted step size, leapfrogs/draw, posterior draw
diversity, mean |expected gradient|); overparam scatter figures per variant
under ``plots/``; a width-trend table on stdout.

Run (TPU, hours — background): ``python -u scripts/grid3.py > grid3.log 2>&1``
Restart-safe: cells with a checkpoint + CSV row are skipped.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ROBUSTBNNS_DATA_FALLBACK", "synthetic")
# Bound device dispatches for the remote backend (CLAUDE.md): grid models are
# small (<=265k params, <=15k inputs), so chunks can be generous.
os.environ.setdefault("ROBUSTBNNS_HMC_CHUNK", "100")
os.environ.setdefault("ROBUSTBNNS_NUTS_CHUNK", "10")
# Per-chunk stderr heartbeat so the stall-guarded runner (stall_guard.sh)
# can tell a healthy 30+-minute h=512 NUTS cell from a wedged dispatch.
os.environ.setdefault("ROBUSTBNNS_MCMC_HEARTBEAT", "1")
# Pin full-f32 sampler matmuls: every existing grid3 cell/checkpoint was
# sampled at "highest"; the framework default moved to "high" in round 5
# (precision study), and a resumed/refilled cell must match its siblings.
os.environ.setdefault("ROBUSTBNNS_MCMC_PRECISION", "highest")

import csv

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

if QUICK:  # tiny shakeout of the whole pipeline
    SWEEP = dict(
        hidden_size=[32], activation=["leaky"], architecture=["fc2"],
        inference=["hmc"], epochs=[None], lr=[None],
        n_samples=[20], warmup=[10], n_inputs=[300],
    )
    S, TEST_POINTS = 20, 20
    CSV_PATH = os.path.join("tests_out", "grid3_quick", "grid3_summary.csv")
    os.makedirs(os.path.dirname(CSV_PATH), exist_ok=True)
else:
    SWEEP = dict(  # reference grid_search_halfMoons.py:157-169
        hidden_size=[32, 128, 256, 512], activation=["leaky"],
        architecture=["fc2"], inference=["hmc"], epochs=[None], lr=[None],
        n_samples=[250], warmup=[100, 200, 500], n_inputs=[5000, 10000, 15000],
    )
    S = 250
    TEST_POINTS = 100
    CSV_PATH = os.path.join(DATA, "grid3_summary.csv")
FIELDS = [
    "variant", "hidden_size", "warmup", "n_inputs", "train_s", "test_acc",
    "accept", "eps", "leapfrog_per_draw", "distinct_draws", "sample_spread",
    "grad_absmean_x", "grad_absmean_y",
]
# (mode, sampler) per variant; 'faithful' retrains with the FIXED round-3
# engine into its own dir (round-2 checkpoints under data/ stay untouched as
# historical artifacts of the pre-windowed-warmup engine).
VARIANT_ENGINE = {
    "faithful": ("faithful", "hmc"),
    "full": ("full", "hmc"),
    "nuts": ("full", "nuts"),
}
if QUICK:
    _BASE = os.path.dirname(CSV_PATH)
    VARIANT_DIR = {v: os.path.join(_BASE, v) for v in ("full", "nuts", "faithful")}
else:
    VARIANT_DIR = {v: os.path.join(DATA, f"grid_{v}")
                   for v in ("full", "nuts", "faithful")}


def existing_rows():
    rows = {}
    if os.path.exists(CSV_PATH):
        with open(CSV_PATH) as f:
            for r in csv.DictReader(f):
                rows[(r["variant"], int(r["hidden_size"]), int(r["warmup"]),
                      int(r["n_inputs"]))] = r
    return rows


def append_row(row):
    new = not os.path.exists(CSV_PATH)
    with open(CSV_PATH, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        if new:
            w.writeheader()
        w.writerow(row)


def sync_tree(tree) -> float:
    return sum(
        float(jnp.sum(leaf)) for leaf in jax.tree_util.tree_leaves(tree)
    )


def posterior_diagnostics(samples):
    """(distinct draws, mean per-param std over draws) of a stacked pytree."""
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(samples)]
    probe = leaves[0].reshape(leaves[0].shape[0], -1)[:, :8]
    distinct = int(np.unique(probe.round(7), axis=0).shape[0])
    tot = sum(l.std(axis=0).sum() for l in leaves)
    n = sum(l[0].size for l in leaves)
    return distinct, float(tot / n)


def train_cell(cell, mode, sampler, seed=0):
    *cfg_args, n_inputs = cell
    cfg = moons_config(*cfg_args)
    x_train, y_train, _, _, inp_shape, out_size = load_dataset(
        "half_moons", n_inputs=n_inputs, shuffle=False
    )
    bnn = BNN.from_config(cfg, inp_shape, out_size, n_inputs=n_inputs)
    t0 = time.perf_counter()
    bnn.train(
        x_train, y_train,
        batch_size=moons_batch_size(cfg.inference),
        hmc_mode=mode, hmc_sampler=sampler, seed=seed, verbose=False,
    )
    sync_tree(bnn.samples)
    return bnn, time.perf_counter() - t0


def main():
    cells = grid_combinations(**SWEEP)
    x_eval = load_dataset("half_moons", n_inputs=TEST_POINTS)
    _, _, xe, ye, inp_shape, out_size = x_eval
    _, _, xg, yg, _, _ = load_dataset(  # grads set: shuffle=True, the
        "half_moons", n_inputs=TEST_POINTS, shuffle=True  # reference's :72
    )
    done = existing_rows()
    t_start = time.time()

    for variant in ("faithful", "full", "nuts"):
        vdir = VARIANT_DIR[variant]
        os.makedirs(vdir, exist_ok=True)
        for cell in cells:
            *cfg_args, n_inputs = cell
            cfg = moons_config(*cfg_args)
            key = (variant, cfg.hidden_size, cfg.warmup, n_inputs)
            if key in done:
                continue
            tag = f"{variant} h={cfg.hidden_size} w={cfg.warmup} n={n_inputs}"
            try:
                bnn = BNN.from_config(cfg, inp_shape, out_size, n_inputs=n_inputs)
                ckpt = os.path.join(vdir, bnn.name, bnn.name + "_weights.npz")
                mode, sampler = VARIANT_ENGINE[variant]
                if os.path.exists(ckpt):
                    bnn.load(rel_path=vdir)
                    train_s, info = float("nan"), None
                else:
                    bnn, train_s = train_cell(cell, mode, sampler)
                    bnn.save(rel_path=vdir)
                    info = getattr(bnn, "hmc_info", None)

                acc = bnn.evaluate(
                    xe, ye, n_samples=S, batch_size=64, verbose=False
                )
                distinct, spread = posterior_diagnostics(bnn.samples)

                from robustbnns_tpu.analysis import (
                    load_loss_gradients,
                    loss_gradients,
                )

                gpath = os.path.join(
                    vdir, bnn.name, f"{bnn.name}_samp={S}_lossGrads.npz"
                )
                if os.path.exists(gpath):
                    grads = load_loss_gradients(S, bnn.name, bnn.name, vdir)
                else:
                    grads = loss_gradients(
                        bnn, xg, yg, n_samples=S, filename=bnn.name,
                        savedir=bnn.name, rel_path=vdir, verbose=False,
                    )
                g = np.abs(np.asarray(grads).reshape(len(grads), -1))

                if info is not None:
                    acc_arr = getattr(info, "accept_prob", None)
                    if acc_arr is None:
                        acc_arr = info.accept_stat
                    accept = float(jnp.mean(acc_arr))
                    eps = float(jnp.mean(info.step_size))
                    nlf = getattr(info, "num_leapfrog", None)
                    leapfrog = float(jnp.mean(nlf)) if nlf is not None else 10.0
                else:
                    accept, eps, leapfrog = (float("nan"),) * 3

                row = dict(
                    variant=variant, hidden_size=cfg.hidden_size,
                    warmup=cfg.warmup, n_inputs=n_inputs,
                    train_s=round(train_s, 2), test_acc=round(acc, 2),
                    accept=round(accept, 3), eps=eps,
                    leapfrog_per_draw=round(leapfrog, 1),
                    distinct_draws=distinct, sample_spread=round(spread, 5),
                    grad_absmean_x=float(g[:, 0].mean()),
                    grad_absmean_y=float(g[:, 1].mean()),
                )
                append_row(row)
                done[key] = row
                print(
                    f"[{time.time() - t_start:7.0f}s] {tag}: train {train_s:.1f}s "
                    f"acc {acc:.1f}% distinct {distinct} spread {spread:.4f} "
                    f"|gx| {row['grad_absmean_x']:.4f}", flush=True,
                )
            except Exception as e:  # keep sweeping; restart-safe via CSV
                print(f"[FAIL] {tag}: {type(e).__name__}: {e}", flush=True)

    # ---- overparam figures for the mixed-posterior variants ---------------
    from robustbnns_tpu.experiments.overparam import (
        build_overparam_scatterplot_dataset,
        overparam_scatterplot,
    )

    for variant in ("faithful", "full", "nuts"):
        vdir = VARIANT_DIR[variant]
        try:
            df = build_overparam_scatterplot_dataset(
                cells, [S], TEST_POINTS, rel_path=vdir, out_dir=vdir,
                verbose=False,
            )
            png = overparam_scatterplot(
                df, SWEEP["hidden_size"], TEST_POINTS,
                plots_dir=os.path.join("plots", f"overparam_{variant}"),
            )
            print(f"overparam[{variant}] -> {png}", flush=True)
        except Exception as e:
            print(f"[FAIL] overparam {variant}: {type(e).__name__}: {e}",
                  flush=True)

    # ---- width-trend table ------------------------------------------------
    import pandas as pd

    df = pd.read_csv(CSV_PATH)
    for variant in ("faithful", "full", "nuts"):
        sub = df[df["variant"] == variant]
        if not len(sub):
            continue
        piv = sub.groupby(["n_inputs", "hidden_size"])[
            ["grad_absmean_x", "grad_absmean_y", "test_acc", "train_s"]
        ].mean()
        print(f"\n=== width trend [{variant}] ===\n{piv.round(4)}", flush=True)
    print(f"GRID3 total {time.time() - t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
