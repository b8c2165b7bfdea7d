"""Baseline-comparison experiment (reference ``plot_baseline_attacks.py``).

Attacks the deterministic, Bayesian and ensemble versions of the same
architecture, collects a long-format dataframe of per-point robustness rows
(``:10-130``), saves it as ``<dataset>_baseline_attacks_<method>.csv``
(``:132-139``) and plots adversarial accuracy + softmax robustness vs defence
samples (``:148-181``).
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


def _rows(model_type, method, epsilon, test_acc, adv_acc, rob, attack_s, defence_s):
    return [
        {
            "model_type": model_type,
            "attack_method": method,
            "epsilon": epsilon,
            "test_acc": test_acc,
            "adv_acc": adv_acc,
            "softmax_rob": float(r),
            "attack_samples": attack_s,
            "defence_samples": defence_s,
        }
        for r in np.asarray(rob)
    ]


def build_baseline_attacks_df(
    nn,
    bnn,
    ensemble,
    x_test,
    y_test,
    *,
    attack_method: str = "fgsm",
    epsilon: float = 0.3,
    bayesian_attack_samples=(1,),
    bayesian_defence_samples=(1, 50, 100),
    ensemble_samples=(1, 50, 100),
    rel_path: str = TESTS,
    verbose: bool = True,
) -> pd.DataFrame:
    """Attack NN, BNN and ensemble; return the long-format dataframe
    (reference ``:10-130``; sample sweeps default to ``:65-66,90``)."""
    from robustbnns_tpu.attacks import attack, attack_evaluation

    rows = []

    # --- deterministic NN (reference :23-52) -------------------------------
    nn_attack = attack(
        nn, x_test, y_test, method=attack_method, epsilon=epsilon,
        filename=getattr(nn, "name", None), rel_path=rel_path,
        save=getattr(nn, "name", None) is not None, verbose=verbose,
    )
    test_acc, adv_acc, rob = attack_evaluation(
        nn, x_test, nn_attack, y_test, verbose=verbose
    )
    rows += _rows("nn", attack_method, epsilon, test_acc, adv_acc, rob, 1, None)

    # --- BNN (reference :54-85) -------------------------------------------
    for attack_samples in bayesian_attack_samples:
        bnn_attack = attack(
            bnn, x_test, y_test, method=attack_method, epsilon=epsilon,
            n_samples=attack_samples, filename=bnn.name, rel_path=rel_path,
            verbose=verbose,
        )
        for defence_samples in bayesian_defence_samples:
            test_acc, adv_acc, rob = attack_evaluation(
                bnn, x_test, bnn_attack, y_test, n_samples=defence_samples,
                verbose=verbose,
            )
            rows += _rows(
                "bnn", attack_method, epsilon, test_acc, adv_acc, rob,
                attack_samples, defence_samples,
            )

    # --- ensemble (reference :87-125) --------------------------------------
    for n_samples in ensemble_samples:
        ens_attack = attack(
            ensemble, x_test, y_test, method=attack_method, epsilon=epsilon,
            n_samples=n_samples, filename=ensemble.name, rel_path=rel_path,
            save=ensemble.name is not None, verbose=verbose,
        )
        test_acc, adv_acc, rob = attack_evaluation(
            ensemble, x_test, ens_attack, y_test, n_samples=n_samples,
            verbose=verbose,
        )
        rows += _rows(
            "ensemble", attack_method, epsilon, test_acc, adv_acc, rob,
            n_samples, n_samples,
        )

    return pd.DataFrame(rows)


def save_baseline_attacks_df(
    df: pd.DataFrame, dataset_name: str, attack_method: str, out_dir: str = TESTS
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(
        out_dir, f"{dataset_name}_baseline_attacks_{attack_method}.csv"
    )
    df.to_csv(path, index=False, header=True)
    return path


def load_baseline_attacks_df(dataset_name, attack_method, out_dir=TESTS):
    return pd.read_csv(
        os.path.join(out_dir, f"{dataset_name}_baseline_attacks_{attack_method}.csv")
    )


def lineplot_baseline_attacks(
    df: pd.DataFrame,
    dataset_name: str,
    attack_method: str,
    n_inputs: int,
    plots_dir: str = PLOTS,
) -> str:
    """Two-panel lineplot vs defence samples (reference ``:148-181``).

    The reference extends each constant-valued row to the x-range ends so
    NN/ensemble show as horizontal lines (``:163-167``); reproduced by
    duplicating rows at xmin/xmax.
    """
    sns.set_style("darkgrid")
    fig, ax = plt.subplots(
        nrows=1, ncols=2, figsize=(10, 6), dpi=150, facecolor="w", edgecolor="k"
    )
    plt.suptitle(f"{attack_method} attack on {dataset_name}")

    xmin = df["defence_samples"].min()
    xmax = df["defence_samples"].max()
    extended = [df]
    for xv in (xmin, xmax):
        d = df.copy()
        d["defence_samples"] = xv
        extended.append(d)
    dfx = pd.concat(extended, ignore_index=True)

    palette = ["black", "darkred", "darkorange"]
    sns.lineplot(
        data=dfx, x="defence_samples", y="adv_acc", hue="model_type",
        ax=ax[0], palette=palette,
    )
    sns.lineplot(
        data=dfx, x="defence_samples", y="softmax_rob", hue="model_type",
        ax=ax[1], palette=palette,
    )

    os.makedirs(plots_dir, exist_ok=True)
    path = os.path.join(
        plots_dir,
        f"{dataset_name}_baseline_attacks_{attack_method}_{n_inputs}.png",
    )
    plt.savefig(path)
    plt.close(fig)
    return path
