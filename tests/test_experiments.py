"""Experiment-layer tests: dataframe builders + figure functions on tiny runs."""
import os

import numpy as np
import pandas as pd
import pytest

from robustbnns_tpu.config import BNNConfig
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.models import BNN, build_architecture, train_ensemble, train_nn


@pytest.fixture(scope="module")
def tiny_models():
    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "half_moons", n_inputs=400
    )
    arch = build_architecture("fc", "leaky", inp_shape, out, 16)
    nn = train_nn(arch, x_train, y_train, epochs=3, lr=0.01, verbose=False)
    ens = train_ensemble(
        arch, x_train, y_train, ensemble_size=3, epochs=2, lr=0.01,
        name="unit_ens", verbose=False,
    )
    cfg = BNNConfig("half_moons", 16, "leaky", "fc", "svi", epochs=3, lr=0.01)
    bnn = BNN.from_config(cfg, inp_shape, out).train(
        x_train, y_train, batch_size=64, train_acc_samples=0, verbose=False
    )
    return nn, bnn, ens, x_test[:32], y_test[:32]


def test_baseline_attacks_df_and_plot(tmp_path, tiny_models):
    from robustbnns_tpu.experiments.baseline import (
        build_baseline_attacks_df,
        lineplot_baseline_attacks,
        save_baseline_attacks_df,
    )

    nn, bnn, ens, x, y = tiny_models
    df = build_baseline_attacks_df(
        nn, bnn, ens, x, y,
        bayesian_attack_samples=(1,), bayesian_defence_samples=(1, 3),
        ensemble_samples=(1, 3), rel_path=str(tmp_path) + "/", verbose=False,
    )
    # rows: nn(32) + bnn(2×32) + ensemble(2×32)
    assert len(df) == 32 * 5
    assert set(df["model_type"]) == {"nn", "bnn", "ensemble"}
    assert df["softmax_rob"].between(0, 1).all()

    csv = save_baseline_attacks_df(df, "half_moons", "fgsm", str(tmp_path))
    assert os.path.exists(csv)
    png = lineplot_baseline_attacks(
        df, "half_moons", "fgsm", 32, plots_dir=str(tmp_path)
    )
    assert os.path.exists(png)


def test_eps_attacks_df_and_plot(tmp_path, tiny_models):
    from robustbnns_tpu.experiments.eps import (
        build_eps_attacks_df,
        lineplot_increasing_eps,
    )

    _, bnn, _, x, y = tiny_models
    df = build_eps_attacks_df(
        bnn, x, y, dataset="half_moons", method="fgsm",
        epsilon_list=(0.1, 0.3), n_samples_list=(1, 3),
        savedir="unit", out_dir=str(tmp_path) + "/", verbose=False,
    )
    assert len(df) == 32 * 4
    assert sorted(df["epsilon"].unique()) == [0.1, 0.3]
    # stronger eps must not increase adversarial accuracy on average
    adv = df.groupby("epsilon")["adv_acc"].mean()
    assert adv[0.3] <= adv[0.1] + 15.0
    png = lineplot_increasing_eps(df, "half_moons", "fgsm", plots_dir=str(tmp_path))
    assert os.path.exists(png)


def test_gradients_figures(tmp_path, tiny_models):
    from robustbnns_tpu.analysis import expected_loss_gradients
    from robustbnns_tpu.experiments.gradients_figures import (
        stripplot_gradients_components,
        vanishing_gradients_heatmaps,
    )

    _, bnn, _, x, y = tiny_models
    n_list = [1, 2]
    grads = [
        np.asarray(expected_loss_gradients(bnn, x, y, n_samples=s)).squeeze()
        for s in n_list
    ]
    png = stripplot_gradients_components(
        grads, n_list, "half_moons", "unit", plots_dir=str(tmp_path)
    )
    assert os.path.exists(png)

    # heatmaps need image-shaped gradients: fabricate a vanishing image
    g = np.zeros((3, 2, 4, 4), np.float32)
    g[0, 0, 0, 0], g[0, 1, 0, 0] = 2.0, 1.0
    images = np.random.default_rng(0).random((3, 4, 4)).astype(np.float32)
    paths = vanishing_gradients_heatmaps(
        images, [g[:, 0], g[:, 1]], [1, 2], "unit", plots_dir=str(tmp_path)
    )
    assert len(paths) == 1 and os.path.exists(paths[0])


def test_grid_search_quick_cell(tmp_path):
    from robustbnns_tpu.experiments.grid_search import (
        grid_cells_for_host,
        grid_combinations,
        grid_compute_grads,
        grid_train,
        moons_batch_size,
        moons_config,
    )

    cells = grid_combinations(
        hidden_size=[16], activation=["leaky"], architecture=["fc"],
        inference=["svi"], epochs=[2], lr=[0.01], n_samples=[None],
        warmup=[None], n_inputs=[200],
    )
    assert len(cells) == 1
    assert moons_batch_size("svi") == 64 and moons_batch_size("hmc") == 1024
    assert moons_config(16, "leaky", "fc", "hmc", None, None, 5, 5).step_size == 0.001

    rel = str(tmp_path) + "/"
    trained = grid_train(cells, rel, verbose=False)
    assert len(trained) == 1
    grid_compute_grads(cells, [2], test_points=16, rel_path=rel, verbose=False)
    # artifacts exist under the name-mangled dir
    name = trained[0].name
    assert os.path.exists(os.path.join(rel, name, f"{name}_samp=2_lossGrads.npz"))

    # host partitioning covers all cells exactly once
    parts = [grid_cells_for_host(cells * 5, h, 3) for h in range(3)]
    assert sum(len(p) for p in parts) == 5


def test_grid_train_sampler_variants(tmp_path):
    """grid_train routes hmc_mode/sampler through to the engines (the round-3
    full-chain / NUTS grid variants) and save=False trains without artifacts."""
    from robustbnns_tpu.experiments.grid_search import grid_combinations, grid_train

    cells = grid_combinations(
        hidden_size=[16], activation=["leaky"], architecture=["fc2"],
        inference=["hmc"], epochs=[None], lr=[None], n_samples=[4],
        warmup=[2], n_inputs=[120],
    )
    rel = str(tmp_path) + "/"
    (nuts_bnn,) = grid_train(
        cells, rel + "nuts/", hmc_mode="full", sampler="nuts", verbose=False
    )
    assert nuts_bnn.samples is not None
    assert hasattr(nuts_bnn.hmc_info, "num_leapfrog")  # the NUTS engine ran
    (timed_bnn,) = grid_train(
        cells, rel + "none/", hmc_mode="full", save=False, verbose=False
    )
    assert not os.path.exists(os.path.join(rel, "none", timed_bnn.name))
    with pytest.raises(ValueError, match="unknown sampler"):
        grid_train(cells, rel + "bad/", sampler="gibbs", verbose=False)


def test_multimodal_flat_posterior(tmp_path):
    from robustbnns_tpu.experiments.multimodal import (
        build_multimodal_df,
        flat_posterior,
        plot_multimodal_kde,
    )

    cfg = BNNConfig(
        "half_moons", 16, "leaky", "fc", "hmc", n_samples=6, warmup=10,
        step_size=0.01,
    )
    x_train, y_train, *_ = load_dataset("half_moons", n_inputs=100)
    bnn = BNN.from_config(cfg, (1, 2, 1), 2).train(
        x_train, y_train, batch_size=100, hmc_mode="full", verbose=False
    )
    flat = flat_posterior(bnn)
    assert flat.shape[0] == 6 and flat.ndim == 2

    df = build_multimodal_df(
        cfg, [50, 100], n_samples=6, rel_path=str(tmp_path) + "/",
        train=True, evaluate=False, verbose=False,
    )
    # 1000 prior rows + 6 per setting
    assert len(df) == 1000 + 2 * 6
    png = plot_multimodal_kde(df, [50, 100], "unit_mm", plots_dir=str(tmp_path))
    assert os.path.exists(png)


def test_overparam_scatter(tmp_path):
    from robustbnns_tpu.experiments.overparam import overparam_scatterplot

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "hidden_size": np.repeat([16, 32], 50),
            "n_inputs": np.tile(np.repeat([100, 200], 25), 2),
            "test_acc": rng.uniform(75, 95, 100),
            "loss_gradients_x": rng.normal(size=100),
            "loss_gradients_y": rng.normal(size=100),
        }
    )
    png = overparam_scatterplot(df, [16, 32], 50, plots_dir=str(tmp_path))
    assert os.path.exists(png)


def test_overparam_report_monotonicity_and_tables(tmp_path, capsys):
    """scripts/overparam_report.py is the cited basis for the PERFORMANCE.md
    overparametrization conclusion — pin its family-wise monotonicity logic
    and table emission on a synthetic CSV with known trends."""
    import importlib.util
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "overparam_report", os.path.join(repo, "scripts", "overparam_report.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rows = []
    for variant, slope in (("nuts", -1.0), ("full", +1.0)):
        for w in (100, 200):
            for n in (5000, 10000):
                for i, h in enumerate((32, 128, 256, 512)):
                    rows.append(dict(
                        variant=variant, hidden_size=h, warmup=w, n_inputs=n,
                        grad_absmean_x=0.5 + slope * 0.1 * i,
                        grad_absmean_y=0.5 + slope * 0.1 * i,
                        sample_spread=1.0, distinct_draws=250, test_acc=100.0,
                    ))
    df = pd.DataFrame(rows)

    dec, inc, tot = mod.monotonicity(df[df.variant == "nuts"], "grad_absmean_x")
    assert (dec, inc, tot) == (4, 0, 4)
    dec, inc, tot = mod.monotonicity(df[df.variant == "full"], "grad_absmean_x")
    assert (dec, inc, tot) == (0, 4, 4)
    # incomplete families (missing a width) are excluded, not miscounted
    part = df[(df.variant == "nuts") & (df.hidden_size != 512)]
    assert mod.monotonicity(part, "grad_absmean_x") == (0, 0, 0)

    csv = tmp_path / "grid.csv"
    df.to_csv(csv, index=False)
    argv, sys.argv = sys.argv, ["overparam_report.py", str(csv)]
    try:
        mod.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "### nuts" in out and "### full" in out
    assert "512-vs-32 gradient ratio: x 0.40" in out  # 0.2/0.5
    assert "4/4 strictly decreasing" in out
