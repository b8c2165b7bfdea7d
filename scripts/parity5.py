import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os; os.environ["ROBUSTBNNS_DATA_FALLBACK"] = "synthetic"
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)
from robustbnns_tpu.config import BNNConfig
from robustbnns_tpu.models import BNN, build_architecture, train_nn, train_ensemble
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.experiments.baseline import build_baseline_attacks_df, save_baseline_attacks_df, lineplot_baseline_attacks

t0 = time.time()
x_train, y_train, x_test, y_test, inp_shape, out = load_dataset("cifar", n_inputs=20000, shuffle=True, fallback="synthetic")
arch = build_architecture("conv2", "leaky", inp_shape, out, 128, "cifar")
nn = train_nn(arch, x_train, y_train, epochs=3, lr=0.001, batch_size=128, name="cifar_nn", verbose=False)
t1 = time.time(); print(f"NN train: {t1-t0:.1f}s", flush=True)
ens = train_ensemble(arch, x_train, y_train, ensemble_size=15, epochs=2, lr=0.001, batch_size=128, name="cifar_ens", verbose=False)
t2 = time.time(); print(f"15-member ensemble train (vmapped): {t2-t1:.1f}s", flush=True)
bcfg = BNNConfig("cifar", 128, "leaky", "conv2", "svi", epochs=3, lr=0.001)
cbnn = BNN.from_config(bcfg, inp_shape, out).train(x_train, y_train, batch_size=128, train_acc_samples=0, verbose=False)
t3 = time.time(); print(f"BNN SVI train: {t3-t2:.1f}s", flush=True)
df = build_baseline_attacks_df(
    nn, cbnn, ens, x_test[:256], y_test[:256],
    bayesian_attack_samples=(1,), bayesian_defence_samples=(1, 15),
    ensemble_samples=(1, 15), rel_path="parity_out/", verbose=False,
)
save_baseline_attacks_df(df, "cifar", "fgsm", "parity_out/")
lineplot_baseline_attacks(df, "cifar", "fgsm", 256, plots_dir="parity_out/plots")
print(f"attacks + eval + df: {time.time()-t3:.1f}s", flush=True)
summary = df.groupby("model_type")[["test_acc", "adv_acc", "softmax_rob"]].mean().round(2)
print(f"CONFIG5 total {time.time()-t0:.1f}s", flush=True)
print(summary.to_string(), flush=True)
