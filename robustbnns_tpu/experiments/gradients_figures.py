"""Gradient-components figures (reference ``plot_gradients_components.py``).

* stripplot of all expected-gradient components vs posterior sample count
  (``:17-52``);
* per-image heatmap rows (original image + one gradient heatmap per sample
  count, annotated with the norm) for images the vanishing-norm detector flags
  (``:54-122``).
"""
from __future__ import annotations

import os
from typing import Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import seaborn as sns  # noqa: E402

from robustbnns_tpu.analysis import compute_vanishing_norms_idxs  # noqa: E402
from robustbnns_tpu.config import PLOTS  # noqa: E402


def stripplot_gradients_components(
    loss_gradients_list: Sequence[np.ndarray],
    n_samples_list: Sequence[int],
    dataset_name: str,
    filename: str,
    plots_dir: str = PLOTS,
) -> str:
    """All gradient components, one strip per sample count (reference ``:17-52``)."""
    sns.set_style("darkgrid")
    fig, ax = plt.subplots(1, 1, figsize=(5, 4), dpi=150)

    components, plot_samples = [], []
    for samples_idx, n_samples in enumerate(n_samples_list):
        flat = np.asarray(loss_gradients_list[samples_idx]).flatten()
        components.extend(flat)
        plot_samples.extend(np.repeat(n_samples, len(flat)))

    df = pd.DataFrame(
        {"loss_gradients": components, "n_samples": plot_samples}
    )
    sns.stripplot(
        x="n_samples", y="loss_gradients", data=df, linewidth=-0.1, ax=ax,
        jitter=0.2, alpha=0.4, palette="rocket",
    )
    ax.set_ylabel(
        r"Expected gradients $\langle\frac{\partial L}{\partial x_i}(x,w)\rangle_{p(w|D)}$"
    )
    ax.set_xlabel(r"Number of posterior samples $w \sim p(w|D)$")
    fig.tight_layout()

    os.makedirs(plots_dir, exist_ok=True)
    path = os.path.join(plots_dir, filename + "_gradComponents.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def _vanishing_gradient_heatmap(image, gradients, n_samples_list, norm):
    """One figure row: original image + per-sample-count gradient heatmaps
    (reference ``:54-99``)."""
    fig, axs = plt.subplots(
        nrows=1, ncols=len(n_samples_list) + 1, figsize=(10, 3)
    )
    sns.heatmap(image, ax=axs[0], square=True, cmap="Greys_r", cbar=False)

    vmin, vmax = float(np.min(gradients)), float(np.max(gradients))
    bottom, width, height = (0.12, 0.01, 0.7)
    for col_idx, samples in enumerate(n_samples_list):
        g = gradients[col_idx]
        cbar_ax = fig.add_axes([0.93, bottom, width, height])
        sns.heatmap(
            g, ax=axs[col_idx + 1], square=True, cmap="vlag",
            vmin=vmin, vmax=vmax, cbar_ax=cbar_ax,
            cbar=col_idx + 1 == len(n_samples_list),
        )
        if norm == "linfty":
            grad_norm = np.max(np.abs(g))
        else:
            grad_norm = np.linalg.norm(g, ord=2)
        axs[col_idx + 1].set_title(f"{grad_norm:.3f}", fontsize=20, weight="bold")
        axs[col_idx + 1].set_xlabel(f"{samples}", fontsize=18, weight="bold")

    axs[0].set_xlabel("   Samples:", fontsize=18, weight="bold")
    for ax in axs:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout(h_pad=2, w_pad=2, rect=[0, 0, 0.93, 1])
    return fig


def vanishing_gradients_heatmaps(
    test_images: np.ndarray,
    loss_gradients_list: Sequence[np.ndarray],
    n_samples_list: Sequence[int],
    filename: str,
    norm: str = "linfty",
    plots_dir: str = PLOTS,
) -> list[str]:
    """Heatmap rows for every vanishing-flagged image (reference ``:101-122``)."""
    transposed = np.transpose(
        np.asarray(loss_gradients_list), axes=(1, 0, 2, 3)
    )
    if transposed.shape[1] != len(n_samples_list):
        raise ValueError("Second dimension should contain the number of samples.")

    vanishing_idxs = compute_vanishing_norms_idxs(
        transposed, n_samples_list=n_samples_list, norm=norm, verbose=False
    )
    out_dir = os.path.join(plots_dir, "vanishing_gradients_heatmaps")
    os.makedirs(out_dir, exist_ok=True)

    paths = []
    for im_idx in vanishing_idxs:
        original = np.squeeze(np.asarray(test_images[im_idx]))
        fig = _vanishing_gradient_heatmap(
            original, transposed[im_idx], n_samples_list, norm
        )
        path = os.path.join(out_dir, f"{filename}_vanGrad_{im_idx}.png")
        fig.savefig(path)
        plt.close(fig)
        paths.append(path)
    return paths
