"""CLI entry-point tests: drive the mains with tiny inputs (reference test.sh).

Uses small fc-based zoo entries (conv-512 compiles slowly on the 1-vCPU test
box); artifact directories are redirected into tmp via the config paths.
"""
import argparse
import os

import pytest

import robustbnns_tpu.config as config


@pytest.fixture()
def tmp_dirs(tmp_path, monkeypatch):
    tests_dir = str(tmp_path / "tests_out") + "/"
    plots_dir = str(tmp_path / "plots") + "/"
    monkeypatch.setattr(config, "TESTS", tests_dir)
    monkeypatch.setattr(config, "PLOTS", plots_dir)
    # Modules read these via `from robustbnns_tpu.config import TESTS` at
    # import time in some places — patch those too.
    for modname in (
        "robustbnns_tpu.models.bnn",
        "robustbnns_tpu.attacks.gradient_attacks",
        "robustbnns_tpu.experiments.grid_search",
    ):
        mod = __import__(modname, fromlist=["TESTS"])
        if hasattr(mod, "TESTS"):
            monkeypatch.setattr(mod, "TESTS", tests_dir)
    monkeypatch.setenv("ROBUSTBNNS_DATA_FALLBACK", "synthetic")
    return tests_dir, plots_dir


def _ns(**kw):
    return argparse.Namespace(**kw)


def test_train_nn_cli_roundtrip(tmp_dirs):
    from robustbnns_tpu.cli import train_nn

    tests_dir, _ = tmp_dirs
    base = dict(
        n_inputs=64, model_idx=5, savedir="TESTS", device="cpu", test=True
    )
    acc1 = train_nn.main(_ns(train=True, **base))
    assert acc1 is not None
    # reload path
    acc2 = train_nn.main(_ns(train=False, **base))
    assert acc2 == pytest.approx(acc1)


def test_train_bnn_cli(tmp_dirs, capsys):
    from robustbnns_tpu.cli import train_bnn

    bnn = train_bnn.main(
        _ns(
            n_inputs=64, model_idx=5, train=True, test=True,
            savedir="TESTS", device="cpu",
        )
    )
    out = capsys.readouterr().out
    assert "Evaluate on test data" in out
    assert bnn.posterior is not None
    # training curve PNG written next to the checkpoint
    import glob

    assert glob.glob(
        os.path.join(config.TESTS, bnn.name, "*_training.png")
    )


def test_loss_gradients_cli_requires_checkpoint(tmp_dirs):
    from robustbnns_tpu.cli import loss_gradients

    with pytest.raises(FileNotFoundError):
        loss_gradients.main(
            _ns(n_inputs=8, model_idx=5, savedir="TESTS", device="cpu")
        )


def test_bnn_then_attacks_cli(tmp_dirs, capsys):
    from robustbnns_tpu.cli import attacks, train_bnn

    train_bnn.main(
        _ns(
            n_inputs=64, model_idx=5, train=True, test=False,
            savedir="TESTS", device="cpu",
        )
    )
    attacks.main(
        _ns(
            n_inputs=16, model_idx=5, model_type="bnn", train=False,
            test=False, attack=True, attack_method="fgsm",
            savedir="TESTS", device="cpu",
        )
    )
    out = capsys.readouterr().out
    assert "adversarial accuracy" in out
