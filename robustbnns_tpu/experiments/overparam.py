"""Overparametrization figure (reference ``plot_halfMoons_overparam.py``).

Joins grid-search checkpoints with their saved expected gradients into a long
dataframe (test-accuracy filter > 70, ``:10,82``) and scatterplots the gradient
components (∂L/∂x₁, ∂L/∂x₂) per hidden size, colored by training-set size —
the "gradients shrink to zero in the overparametrized limit" figure.
"""
from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import seaborn as sns  # noqa: E402

from robustbnns_tpu.config import PLOTS, TESTS  # noqa: E402

ACC_THS = 70  # reference :10


def plot_half_moons(n_points: int = 200, plots_dir: str = PLOTS) -> str:
    """Scatter of the raw half-moons data (reference ``:17-31``)."""
    from robustbnns_tpu.data import load_dataset, onehot_to_labels

    x_train, y_train, *_ = load_dataset("half_moons", n_inputs=n_points)
    labels = onehot_to_labels(y_train)
    sns.set_style("darkgrid")
    fig, ax = plt.subplots(figsize=(10, 6), dpi=150)
    pts = x_train.squeeze()
    df = pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1], "label": labels})
    sns.scatterplot(data=df, x="x", y="y", hue="label", alpha=0.9, ax=ax)
    os.makedirs(plots_dir, exist_ok=True)
    path = os.path.join(plots_dir, f"halfMoons_{n_points}.png")
    plt.savefig(path)
    plt.close(fig)
    return path


def build_overparam_scatterplot_dataset(
    cells,
    posterior_samples_list,
    test_points: int,
    rel_path: str = TESTS,
    out_dir: str = TESTS,
    verbose: bool = True,
) -> pd.DataFrame:
    """Evaluate each grid cell + join its gradients (reference ``:34-79``)."""
    from robustbnns_tpu.analysis import load_loss_gradients
    from robustbnns_tpu.data import load_dataset
    from robustbnns_tpu.experiments.grid_search import moons_config
    from robustbnns_tpu.models import BNN

    _, _, x_test, y_test, inp_shape, out_size = load_dataset(
        "half_moons", n_inputs=test_points
    )

    rows = []
    for cell in cells:
        *cfg_args, n_inputs = cell
        cfg = moons_config(*cfg_args)
        bnn = BNN.from_config(cfg, inp_shape, out_size, n_inputs=n_inputs).load(
            rel_path=rel_path
        )
        for n_samples in posterior_samples_list:
            test_acc = bnn.evaluate(
                x_test, y_test, n_samples=n_samples, batch_size=64,
                verbose=verbose,
            )
            grads = load_loss_gradients(n_samples, bnn.name, bnn.name, rel_path)
            pts = np.asarray(x_test).squeeze()
            for idx, grad in enumerate(np.asarray(grads)[:test_points]):
                rows.append(
                    {
                        "hidden_size": cfg.hidden_size,
                        "activation": cfg.activation,
                        "architecture": cfg.architecture,
                        "inference": cfg.inference,
                        "epochs": cfg.epochs,
                        "lr": cfg.lr,
                        "n_samples": cfg.n_samples,
                        "warmup": cfg.warmup,
                        "n_inputs": n_inputs,
                        "posterior_samples": n_samples,
                        "test_acc": test_acc,
                        "x": pts[idx, 0],
                        "y": pts[idx, 1],
                        "loss_gradients_x": float(np.ravel(grad)[0]),
                        "loss_gradients_y": float(np.ravel(grad)[1]),
                    }
                )

    df = pd.DataFrame(rows)
    os.makedirs(out_dir, exist_ok=True)
    df.to_csv(
        os.path.join(out_dir, f"halfMoons_lossGrads_final_{test_points}.csv"),
        index=False, header=True,
    )
    return df


def overparam_scatterplot(
    dataset: pd.DataFrame,
    hidden_size,
    test_points: int,
    orient: str = "h",
    plots_dir: str = PLOTS,
) -> str:
    """Per-hidden-size gradient-component scatter (reference ``:81-144``)."""
    dataset = dataset[dataset["test_acc"] > ACC_THS]
    dataset = dataset[dataset["hidden_size"].isin(hidden_size)]

    rows_vals = np.unique(dataset["hidden_size"])
    nrows = len(rows_vals)
    sns.set_style("darkgrid")
    cmap = plt.get_cmap("rocket_r", 5)
    palette = [
        matplotlib.colors.rgb2hex(cmap(i + 1))
        for i in range(len(np.unique(dataset["n_inputs"])))
    ]

    if orient == "v":
        num_rows, num_cols, figsize = nrows, 1, (4, 7)
    else:
        num_rows, num_cols, figsize = 1, nrows, (10, 2.3)

    fig, ax = plt.subplots(
        nrows=num_rows, ncols=num_cols, figsize=figsize, dpi=150,
        facecolor="w", edgecolor="k",
    )
    ax = np.atleast_1d(ax)

    for r, row_val in enumerate(rows_vals):
        df = dataset[dataset["hidden_size"] == row_val]
        legend = "full" if r == nrows - 1 else False
        sns.scatterplot(
            data=df, x="loss_gradients_x", y="loss_gradients_y", alpha=0.7,
            hue="n_inputs", size="n_inputs", legend=legend, ax=ax[r],
            sizes=(30, 80), palette=palette,
        )
        xlim = 1.1 * max(np.max(np.abs(df["loss_gradients_x"])), 1e-12)
        ylim = 1.1 * max(np.max(np.abs(df["loss_gradients_y"])), 1e-12)
        ax[r].set_xlim(-xlim, xlim)
        ax[r].set_ylim(-ylim, ylim)
        ax[r].set_title(str(row_val), fontdict=dict(weight="bold", size=10))
        ax[r].set_xlabel(
            r"$\langle \frac{\partial L}{\partial x_1}(x,w)\rangle_{p(w|D)}$",
            labelpad=3, fontsize=11,
        )
    ax[0].set_ylabel(
        r"$\langle \frac{\partial L}{\partial x_2}(x,w)\rangle_{p(w|D)}$",
        labelpad=3, fontsize=11,
    )

    plt.tight_layout()
    os.makedirs(plots_dir, exist_ok=True)
    path = os.path.join(plots_dir, f"halfMoons_final_hmc_{test_points}.png")
    plt.savefig(path)
    plt.close(fig)
    return path
