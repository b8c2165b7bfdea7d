"""Matplotlib persistence helpers.

Serves the same two jobs as the reference's plotting utilities (training
curves and attack image grids, reference ``utils.py:267-290``) with this
repo's own structure. Headless-safe (Agg backend). Visual parity is kept
through the named style constants below, not by mirroring call sites.

Deliberate divergence: the reference's grid dump iterates subplot slots
``range(1, rows*cols)`` (``utils.py:280``), which both skips image 0 and
leaves the last grid cell empty — an off-by-one in the original. Here the
grid shows images ``0 .. rows*cols-1``, i.e. every cell filled starting from
the first image.
"""
from __future__ import annotations

import math
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

# Style constants (match the reference figures' look).
CURVE_FIGSIZE = (12, 8)  # two stacked panels, reference utils.py:268
GRID_FIGSIZE = (8, 8)  # square image grid, reference utils.py:278
GRID_MAX_SIDE = 10  # at most a 10x10 grid, reference utils.py:279


def plot_loss_accuracy(history: dict, path: str) -> str:
    """Stacked per-epoch curves, one panel per metric in ``history``.

    ``history`` maps metric name -> list of per-epoch values (the dict
    ``svi_train``/``train_nn`` return). Reference behavior: a "loss" panel
    over an "accuracy" panel (``utils.py:267-274``).
    """
    metrics = [m for m in ("loss", "accuracy") if m in history]
    fig, axes = plt.subplots(len(metrics), figsize=CURVE_FIGSIZE, squeeze=False)
    for ax, metric in zip(axes[:, 0], metrics):
        ax.plot(history[metric])
        ax.set_title(metric)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return path


def _as_2d(image: np.ndarray) -> np.ndarray:
    """Squeeze an image to 2-D for imshow; 1-D data (half-moons points
    reshaped to (1,2,1)) renders as a single pixel row."""
    image = np.squeeze(image)
    return image[None, :] if image.ndim == 1 else image


def plot_save_grid_images(images, filename: str, savedir: str) -> str:
    """Dump a square grid of the first ``side**2`` images (side ≤ 10).

    Used by the attack driver to record original vs adversarial inputs
    (reference ``adversarialAttacks.py:135-141`` via ``utils.py:276-290``).
    """
    images = np.asarray(images)
    side = max(1, min(math.isqrt(len(images)), GRID_MAX_SIDE))

    fig, axes = plt.subplots(side, side, figsize=GRID_FIGSIZE, squeeze=False)
    for idx, ax in enumerate(axes.ravel()):
        if idx < len(images):  # empty/short input: leave remaining axes blank
            ax.imshow(_as_2d(images[idx]))
        ax.set_axis_off()

    os.makedirs(savedir, exist_ok=True)
    path = os.path.join(savedir, filename)
    fig.savefig(path)
    plt.close(fig)
    return path
