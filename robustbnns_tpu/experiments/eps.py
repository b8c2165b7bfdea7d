"""ε-sweep experiment (reference ``plot_eps_attacks.py``).

Attacks a BNN over increasing ε and sample counts, using the SAME samples for
attack and defence (``:16-33``); CSV ``<dataset>_increasing_eps_<method>.csv``
and two stacked lineplots (``:45-65``).
"""
from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import seaborn as sns  # noqa: E402

from robustbnns_tpu.config import DATA, PLOTS  # noqa: E402


def build_eps_attacks_df(
    bnn,
    x_test,
    y_test,
    *,
    dataset: str,
    method: str = "fgsm",
    epsilon_list=(0.1, 0.15, 0.2, 0.25, 0.3),
    n_samples_list=(1, 10, 50),
    savedir: str | None = None,
    out_dir: str = DATA,
    verbose: bool = True,
) -> pd.DataFrame:
    """Sweep (ε × n_samples); same n_samples for attack & defence
    (reference ``:16-33``; sweep defaults ``:89-90``)."""
    from robustbnns_tpu.attacks import attack, attack_evaluation

    rows = []
    for epsilon in epsilon_list:
        for n_samples in n_samples_list:
            x_attack = attack(
                bnn, x_test, y_test, method=method, epsilon=epsilon,
                n_samples=n_samples, save=False, verbose=verbose,
            )
            test_acc, adv_acc, rob = attack_evaluation(
                bnn, x_test, x_attack, y_test, n_samples=n_samples,
                verbose=verbose,
            )
            for r in np.asarray(rob):
                rows.append(
                    {
                        "attack_method": method,
                        "epsilon": epsilon,
                        "test_acc": test_acc,
                        "adv_acc": adv_acc,
                        "softmax_rob": float(r),
                        "n_samples": n_samples,
                    }
                )

    df = pd.DataFrame(rows)
    d = os.path.join(out_dir, savedir or bnn.name)
    os.makedirs(d, exist_ok=True)
    df.to_csv(
        os.path.join(d, f"{dataset}_increasing_eps_{method}.csv"),
        index=False, header=True,
    )
    return df


def load_eps_attacks_df(dataset, method, savedir, out_dir=DATA):
    return pd.read_csv(
        os.path.join(out_dir, savedir, f"{dataset}_increasing_eps_{method}.csv")
    )


def lineplot_increasing_eps(
    df: pd.DataFrame, dataset: str, method: str, plots_dir: str = PLOTS
) -> str:
    """adv_acc and softmax_rob vs ε, styled by n_samples (reference ``:45-65``)."""
    sns.set_style("darkgrid")
    palette = ["black", "darkred", "darkorange"]
    fig, ax = plt.subplots(
        nrows=2, ncols=1, figsize=(8, 6), dpi=150, facecolor="w", edgecolor="k"
    )
    plt.suptitle(f"{method} attack on {dataset}")
    sns.lineplot(
        data=df, x="epsilon", y="adv_acc", style="n_samples", hue="n_samples",
        ax=ax[0], palette=palette,
    )
    sns.lineplot(
        data=df, x="epsilon", y="softmax_rob", style="n_samples", hue="n_samples",
        ax=ax[1], palette=palette,
    )
    os.makedirs(plots_dir, exist_ok=True)
    path = os.path.join(plots_dir, f"{dataset}_increasing_eps_{method}.png")
    plt.savefig(path)
    plt.close(fig)
    return path
