"""Matplotlib persistence helpers (reference ``utils.py:267-290``).

Headless-safe (Agg backend); used by training (loss/accuracy curves) and the
attack driver (original/adversarial image grids).
"""
from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_loss_accuracy(history: dict, path: str) -> str:
    """Two-panel loss/accuracy training curve (reference ``utils.py:267-274``)."""
    fig, (ax1, ax2) = plt.subplots(2, figsize=(12, 8))
    ax1.plot(history["loss"])
    ax1.set_title("loss")
    ax2.plot(history["accuracy"])
    ax2.set_title("accuracy")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return path


def plot_save_grid_images(images, filename: str, savedir: str) -> str:
    """Square grid dump of up to 10×10 images (reference ``utils.py:276-290``)."""
    images = np.asarray(images)
    fig = plt.figure(figsize=(8, 8))
    rows = cols = max(1, min(int(np.sqrt(len(images))), 10))
    for i in range(1, cols * rows):
        fig.add_subplot(rows, cols, i)
        image = np.squeeze(images[i])
        if image.ndim == 1:
            image = image[None, :]
        plt.imshow(image)
        plt.axis("off")
    os.makedirs(savedir, exist_ok=True)
    path = os.path.join(savedir, filename)
    plt.savefig(path)
    plt.close(fig)
    return path
