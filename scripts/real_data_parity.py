"""Real-data parity runbook — ONE command for real-data day (VERDICT r2 #2).

Every MNIST/Fashion/CIFAR number so far was measured on the synthetic
surrogate (zero-egress box). When the real files exist, this script runs the
five BASELINE parity configs on the REAL bytes and asserts the recorded
tolerances, producing ``parity_out/real_data_parity.json`` as the durable
record.

Where to put the files (any one of ``$ROBUSTBNNS_DATASET_DIR``,
``~/.keras/datasets``, ``./data``):

* ``mnist.npz`` (keras keying) — or the four IDX ``*-ubyte[.gz]`` files under
  a ``mnist/`` subdir;
* Fashion-MNIST: the four IDX files under ``fashion-mnist/`` (exactly what
  keras downloads);
* CIFAR-10: ``data_batch_1..5`` + ``test_batch`` under ``$ROBUSTBNNS_CIFAR_DIR``
  or ``data/cifar-10/``.

Tolerances: clean-accuracy floors are the published ballparks for these tiny
architectures on the real datasets; robustness assertions encode the paper's
central claim (the BNN holds under attack, deterministic nets collapse —
``plot_baseline_attacks.py:10-145``). The within-1%-of-reference adversarial
check additionally needs a Pyro run of ``/root/reference`` — compare this
script's JSON against that run's output when an environment with Pyro exists
(TODO #8 in TODO.md).

Run: ``python scripts/real_data_parity.py [--quick]``  (TPU, ~15-30 min)
Exit codes: 0 = all present+passed, 2 = required datasets missing.
"""
import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import json
import os

QUICK = "--quick" in sys.argv

import jax

if "--cpu" in sys.argv:  # validation runs while the TPU is busy
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

from robustbnns_tpu.attacks import attack, attack_evaluation
from robustbnns_tpu.config import BNNConfig, saved_BNNs
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.models import BNN

RESULTS = {}
FAILURES = []


def check(name, value, lo=None, hi=None):
    RESULTS[name] = value
    ok = (lo is None or value >= lo) and (hi is None or value <= hi)
    tag = "PASS" if ok else "FAIL"
    print(f"[{tag}] {name} = {value:.3f}"
          + (f" (>= {lo})" if lo is not None else "")
          + (f" (<= {hi})" if hi is not None else ""), flush=True)
    if not ok:
        FAILURES.append(name)


def have(dataset):
    """True iff the REAL files are present (no synthetic fallback)."""
    env = os.environ.pop("ROBUSTBNNS_DATA_FALLBACK", None)
    try:
        load_dataset(dataset, n_inputs=8, fallback="error")
        return True
    except FileNotFoundError:
        return False
    finally:
        if env is not None:
            os.environ["ROBUSTBNNS_DATA_FALLBACK"] = env


def config1_half_moons():
    """Half Moons SVI + FGSM (always runnable — sklearn data is real)."""
    n = 1000 if QUICK else 10000
    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "half_moons", n_inputs=n
    )
    cfg = BNNConfig("half_moons", 32, "leaky", "fc2", "svi", epochs=30, lr=0.01)
    bnn = BNN.from_config(cfg, inp_shape, out, n_inputs=n)
    bnn.train(x_train, y_train, batch_size=64, verbose=False)
    acc = bnn.evaluate(x_test, y_test, n_samples=10, verbose=False)
    x_adv = attack(bnn, x_test[:500], y_test[:500], method="fgsm",
                   n_samples=10, save=False, verbose=False)
    _, adv, rob = attack_evaluation(bnn, x_test[:500], x_adv, y_test[:500],
                                    n_samples=10, verbose=False)
    check("c1_half_moons_svi_clean_acc", acc, lo=75.0)
    RESULTS["c1_half_moons_svi_fgsm_adv_acc"] = adv
    RESULTS["c1_half_moons_svi_fgsm_rob"] = float(jnp.mean(rob))


def config2_width_sweep():
    """Half Moons HMC width cells + expected gradients (grid slice)."""
    from robustbnns_tpu.analysis import expected_loss_gradients
    from robustbnns_tpu.experiments.grid_search import moons_config

    n = 1000 if QUICK else 10000
    samples = 50 if QUICK else 250
    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "half_moons", n_inputs=n
    )
    for hid in ([32] if QUICK else [32, 512]):
        cfg = moons_config(hid, "leaky", "fc2", "hmc", None, None, samples, 100)
        bnn = BNN.from_config(cfg, inp_shape, out, n_inputs=n)
        bnn.train(x_train, y_train, batch_size=1024, verbose=False)
        acc = bnn.evaluate(x_test[:500], y_test[:500], n_samples=samples,
                           batch_size=64, verbose=False)
        g = expected_loss_gradients(bnn, x_test[:100], y_test[:100],
                                    n_samples=samples, batch_size=100)
        check(f"c2_moons_hmc_h{hid}_clean_acc", acc, lo=90.0)
        RESULTS[f"c2_moons_hmc_h{hid}_grad_absmean"] = float(jnp.abs(g).mean())


def config3_mnist_northstar():
    """MNIST model_0 SVI (60k) + Bayesian PGD S=100 (the north-star)."""
    n = 2000 if QUICK else 60000
    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "mnist", n_inputs=n, shuffle=True, fallback="error"
    )
    bnn = BNN.from_config(saved_BNNs["model_0"], inp_shape, out)
    bnn.train(x_train, y_train, batch_size=128, verbose=False)
    acc = bnn.evaluate(x_test[: min(n, 10000)], y_test[: min(n, 10000)],
                       n_samples=10, verbose=False)
    n_att = 200 if QUICK else 1000
    x_adv = attack(bnn, x_test[:n_att], y_test[:n_att], method="pgd",
                   epsilon=0.3, n_samples=100, save=False, verbose=False)
    _, adv, rob = attack_evaluation(bnn, x_test[:n_att], x_adv, y_test[:n_att],
                                    n_samples=100, verbose=False)
    check("c3_mnist_svi_clean_acc", acc, lo=85.0)  # small conv BNN ballpark
    # The paper's claim: Bayesian PGD does not collapse the BNN.
    check("c3_mnist_pgd100_adv_acc", adv, lo=acc - 30.0)
    RESULTS["c3_mnist_pgd100_rob"] = float(jnp.mean(rob))


def config4_fashion_hmc():
    """Fashion-MNIST HMC fc2-1024 + vanishing-gradient detection."""
    from robustbnns_tpu.analysis import (
        compute_vanishing_norms_idxs,
        expected_loss_gradients,
    )

    n = 2000 if QUICK else 20000
    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "fashion_mnist", n_inputs=n, shuffle=True, fallback="error"
    )
    cfg = BNNConfig("fashion_mnist", 1024, "leaky", "fc2", "hmc",
                    n_samples=100, warmup=50)
    bnn = BNN.from_config(cfg, inp_shape, out)
    bnn.train(x_train, y_train, batch_size=5000, verbose=False)
    acc = bnn.evaluate(x_test[:2000], y_test[:2000], n_samples=100,
                       batch_size=250, verbose=False)
    n_list = [1, 10, 100]
    grads = np.stack([
        np.asarray(expected_loss_gradients(
            bnn, x_test[:128], y_test[:128], n_samples=s, batch_size=128
        )).squeeze()
        for s in n_list
    ], axis=1)
    idxs = compute_vanishing_norms_idxs(grads, n_list, verbose=False)
    check("c4_fashion_hmc_clean_acc", acc, lo=70.0)
    RESULTS["c4_fashion_vanishing_frac"] = len(idxs) / 128.0


def config5_cifar_baseline():
    """CIFAR: NN vs 15-member ensemble vs BNN under FGSM
    (scripts/baseline100.py is the 100-member variant of this flow)."""
    from robustbnns_tpu.experiments.baseline import build_baseline_attacks_df
    from robustbnns_tpu.models import build_architecture, train_ensemble, train_nn

    n = 2000 if QUICK else 20000
    n_test = 256 if QUICK else 512
    x_train, y_train, x_test, y_test, inp_shape, out = load_dataset(
        "cifar", n_inputs=n, shuffle=True, fallback="error"
    )
    arch = build_architecture("conv2", "leaky", inp_shape, out, 128, "cifar")
    nn = train_nn(arch, x_train, y_train, epochs=3, lr=0.001, batch_size=128,
                  verbose=False)
    ens = train_ensemble(arch, x_train, y_train, ensemble_size=15, epochs=2,
                         lr=0.001, batch_size=128, verbose=False)
    bcfg = BNNConfig("cifar", 128, "leaky", "conv2", "svi", epochs=12, lr=0.001)
    cbnn = BNN.from_config(bcfg, inp_shape, out).train(
        x_train, y_train, batch_size=128, train_acc_samples=0, verbose=False
    )
    df = build_baseline_attacks_df(
        nn, cbnn, ens, x_test[:n_test], y_test[:n_test],
        bayesian_attack_samples=(1,),
        bayesian_defence_samples=(1, 50) if QUICK else (1, 50, 100),
        ensemble_samples=(1, 15),
        rel_path="parity_out/real_cifar", verbose=False,
    )
    by_model = df.groupby("model_type")[["adv_acc"]].max()
    bnn_adv = float(by_model.loc["bnn"].iloc[0])
    nn_adv = float(by_model.loc["nn"].iloc[0])
    RESULTS["c5_cifar_nn_adv_acc"] = nn_adv
    RESULTS["c5_cifar_bnn_adv_acc"] = bnn_adv
    # Paper's ordering: the BNN holds far above the deterministic net.
    check("c5_cifar_bnn_minus_nn_adv", bnn_adv - nn_adv, lo=0.0)


def main():
    t0 = time.time()
    present = {d: have(d) for d in ("mnist", "fashion_mnist", "cifar")}
    print("real files present:", present, flush=True)

    config1_half_moons()
    config2_width_sweep()
    if present["mnist"]:
        config3_mnist_northstar()
    if present["fashion_mnist"]:
        config4_fashion_hmc()
    if present["cifar"]:
        config5_cifar_baseline()

    os.makedirs("parity_out", exist_ok=True)
    record = {
        "present": present, "results": RESULTS, "failures": FAILURES,
        "quick": QUICK, "elapsed_s": round(time.time() - t0, 1),
    }
    with open("parity_out/real_data_parity.json", "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record), flush=True)

    if not all(present.values()):
        missing = [d for d, ok in present.items() if not ok]
        print(
            f"MISSING real datasets: {missing} — drop the files per the "
            "module docstring and re-run. (Half Moons configs ran on real "
            "sklearn data regardless.)",
            flush=True,
        )
        sys.exit(2)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
