"""Reference-scale CIFAR baseline: 100-member ensemble (VERDICT round-1 item 4b).

The reference's baseline-comparison experiment trains a 100-member ensemble
(``plot_baseline_attacks.py:89-90``) and compares NN vs BNN vs ensemble under
attack with defence samples [1, 50, 100] (``:65-66``). Round 1 ran 15 members;
this is the full 100, trained in vmapped chunks (``member_chunk``) to bound
optimizer memory. CIFAR via the offline synthetic surrogate (identical
shapes/preprocessing).

Run: ``python scripts/baseline100.py`` (TPU; writes under baseline100_out/).
"""
import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os
os.environ.setdefault("ROBUSTBNNS_DATA_FALLBACK", "synthetic")
import jax
import numpy as np

print("backend:", jax.default_backend(), flush=True)

from robustbnns_tpu.config import BNNConfig
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.experiments.baseline import (
    build_baseline_attacks_df,
    lineplot_baseline_attacks,
    save_baseline_attacks_df,
)
from robustbnns_tpu.models import BNN, build_architecture, train_ensemble, train_nn

OUT = "baseline100_out/"
ENSEMBLE_SIZE = 100  # plot_baseline_attacks.py:89-90
MEMBER_CHUNK = 20
N_TEST = 512

t0 = time.time()
x_train, y_train, x_test, y_test, inp_shape, out_size = load_dataset(
    "cifar", n_inputs=20000, shuffle=True, fallback="synthetic"
)
arch = build_architecture("conv2", "leaky", inp_shape, out_size, 128, "cifar")

nn = train_nn(
    arch, x_train, y_train, epochs=3, lr=0.001, batch_size=128,
    name="cifar_nn", verbose=False,
)
t1 = time.time()
print(f"NN train: {t1 - t0:.1f}s", flush=True)

ens = train_ensemble(
    arch, x_train, y_train, ensemble_size=ENSEMBLE_SIZE, epochs=2, lr=0.001,
    batch_size=128, name="cifar_ens100", member_chunk=MEMBER_CHUNK,
    verbose=True,
)
t2 = time.time()
print(f"{ENSEMBLE_SIZE}-member ensemble train "
      f"(chunks of {MEMBER_CHUNK}): {t2 - t1:.1f}s", flush=True)

# 12 epochs: the unscaled-KL SVI objective underfits the harder shared-blob
# surrogate at 3 epochs (14% clean acc); the NN/ensemble are unaffected.
bcfg = BNNConfig("cifar", 128, "leaky", "conv2", "svi", epochs=12, lr=0.001)
cbnn = BNN.from_config(bcfg, inp_shape, out_size).train(
    x_train, y_train, batch_size=128, train_acc_samples=0, verbose=False
)
t3 = time.time()
print(f"BNN SVI train: {t3 - t2:.1f}s", flush=True)

df = build_baseline_attacks_df(
    nn, cbnn, ens, x_test[:N_TEST], y_test[:N_TEST],
    bayesian_attack_samples=(1,),            # reference :65
    bayesian_defence_samples=(1, 50, 100),   # reference :66
    ensemble_samples=(1, 50, 100),           # reference :89-90
    rel_path=OUT, verbose=False,
)
save_baseline_attacks_df(df, "cifar", "fgsm", OUT)
lineplot_baseline_attacks(df, "cifar", "fgsm", N_TEST, plots_dir=OUT + "plots")
t4 = time.time()
print(f"attacks + eval + df: {t4 - t3:.1f}s", flush=True)

summary = df.groupby("model_type")[["test_acc", "adv_acc", "softmax_rob"]].mean().round(2)
print(f"BASELINE100 total {t4 - t0:.1f}s", flush=True)
print(summary.to_string(), flush=True)
