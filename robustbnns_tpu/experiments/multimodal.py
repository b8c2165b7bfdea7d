"""Posterior multimodality experiment (reference ``test_multimodal.py``).

Trains single-chain **full-batch** HMC BNNs at increasing training-set sizes
(``batch_size = n_inputs``, reference ``:72-74``), flattens every posterior
sample's weights, projects to 2-D with PCA (shared or per-setting,
``:100-161``), and KDE-plots the prior (1000 N(0,1) draws, ``:109-118``)
against the posteriors (``:170-194``).

TPU note: the flattened posterior IS our native representation — the HMC
sampler already returns a stacked ``(S, D)`` matrix, so the reference's
per-sample module-flattening loop (``:87-98``) disappears.
"""
from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import seaborn as sns  # noqa: E402

from robustbnns_tpu.config import BNNConfig, DATA, PLOTS  # noqa: E402


def flat_posterior(bnn) -> np.ndarray:
    """(S, D) matrix of flattened posterior samples."""
    import jax

    from robustbnns_tpu.utils.pytree import flatten_tree_to_vector

    if bnn.samples is None:
        raise ValueError("train() or load() the HMC BNN first")
    flat = jax.vmap(lambda t: flatten_tree_to_vector(t)[0])(bnn.samples)
    return np.asarray(flat)


def multimodal_filename(cfg: BNNConfig, n_inputs: int) -> str:
    """Reference per-setting checkpoint name (``:76``)."""
    return f"{cfg.dataset}_{cfg.architecture}_{cfg.inference}_trainInp={n_inputs}"


def build_multimodal_df(
    cfg: BNNConfig,
    n_inputs_list,
    *,
    n_samples: int,
    rel_path: str = DATA,
    train: bool = True,
    evaluate: bool = True,
    same_pca: bool = False,
    seed: int = 0,
    hmc_sampler: str = "hmc",
    hmc_init: str = "random",
    verbose: bool = True,
) -> pd.DataFrame:
    """Train/load per-n_inputs posteriors, PCA them + prior draws to 2-D.

    ``hmc_sampler='nuts'`` swaps in the No-U-Turn sampler — the fix for the
    60k-input full-batch chain, which fixed-trajectory HMC cannot mix from a
    random init (PERFORMANCE.md).
    """
    from sklearn import decomposition

    from robustbnns_tpu.data import load_dataset
    from robustbnns_tpu.models import BNN

    x_train_full, y_train_full, x_test, y_test, inp_shape, out_size = load_dataset(
        cfg.dataset, n_inputs=60000, shuffle=True, fallback="synthetic"
    )

    all_weights = {}
    for n_inputs in n_inputs_list:
        filename = multimodal_filename(cfg, n_inputs)
        bnn = BNN.from_config(cfg, inp_shape, out_size)
        if train:
            if verbose:
                print(f"\n=== multimodal: training {filename}")
            # single chain, full-batch (reference :72-74)
            bnn.train(
                x_train_full[:n_inputs], y_train_full[:n_inputs],
                batch_size=n_inputs, hmc_mode="full", seed=seed,
                hmc_sampler=hmc_sampler, hmc_init=hmc_init,
                verbose=verbose,
            )
            bnn.save(rel_path=rel_path, filename=filename)
        else:
            bnn.load(rel_path=rel_path, filename=filename)
        if evaluate:
            bnn.evaluate(x_test, y_test, n_samples=n_samples, verbose=verbose)
        all_weights[n_inputs] = flat_posterior(bnn)[:n_samples]

    d = all_weights[n_inputs_list[0]].shape[1]
    rng = np.random.default_rng(seed)
    prior_weights = rng.standard_normal((1000, d)).astype(np.float32)

    rows = []
    if same_pca:
        pca = decomposition.PCA(n_components=2)
        pca.fit(np.concatenate(list(all_weights.values())))
        transform = pca.transform
        prior_2d = transform(prior_weights)
    else:
        prior_2d = decomposition.PCA(n_components=2).fit_transform(prior_weights)

    for obs in prior_2d:
        rows.append(
            {"n_samples": 1000, "n_training_points": 0, "x": obs[0], "y": obs[1]}
        )

    for n_inputs, weights in all_weights.items():
        if same_pca:
            w2d = transform(weights)
        else:
            w2d = decomposition.PCA(n_components=2).fit_transform(weights)
        for obs in w2d:
            rows.append(
                {
                    "n_samples": int(n_samples),
                    "n_training_points": n_inputs,
                    "x": obs[0],
                    "y": obs[1],
                }
            )
    return pd.DataFrame(rows)


def plot_multimodal_kde(
    df: pd.DataFrame,
    n_inputs_list,
    plot_filename: str,
    plots_dir: str = PLOTS,
) -> str:
    """Prior + per-n_inputs posterior KDEs (reference ``:170-194``)."""
    cmap = plt.get_cmap("rocket", 5)
    palette = [matplotlib.colors.rgb2hex(cmap(i)) for i in range(cmap.N)]

    sns.set_style("darkgrid")
    fig, ax = plt.subplots(
        1, len(n_inputs_list) + 1, figsize=(10, 3), dpi=150,
        facecolor="w", edgecolor="k",
    )
    fig.tight_layout()

    temp = df[df["n_training_points"] == 0]
    sns.kdeplot(data=temp, x="x", y="y", ax=ax[0], color=palette[0])
    ax[0].set_title("Prior", weight="bold")

    for idx, n_inputs in enumerate(n_inputs_list):
        temp = df[df["n_training_points"] == n_inputs]
        sns.kdeplot(data=temp, x="x", y="y", ax=ax[idx + 1], color=palette[idx + 1])
        ax[idx + 1].set_title(
            f"Posterior\nTraining pts = {n_inputs}", weight="bold"
        )

    os.makedirs(plots_dir, exist_ok=True)
    path = os.path.join(plots_dir, plot_filename + ".png")
    fig.savefig(path)
    plt.close(fig)
    return path
