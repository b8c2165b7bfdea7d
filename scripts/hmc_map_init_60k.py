import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os; os.environ["ROBUSTBNNS_DATA_FALLBACK"] = "synthetic"
import jax
print("backend:", jax.default_backend(), flush=True)
import dataclasses
from robustbnns_tpu.config import multimodal_BNNs
from robustbnns_tpu.models import BNN
from robustbnns_tpu.data import load_dataset

cfg = dataclasses.replace(multimodal_BNNs["model_10"], n_samples=50)
x_train, y_train, x_test, y_test, inp_shape, out = load_dataset("mnist", n_inputs=60000, shuffle=True, fallback="synthetic")
t0 = time.time()
bnn = BNN.from_config(cfg, inp_shape, out).train(
    x_train[:60000], y_train[:60000], batch_size=60000, hmc_mode="full", hmc_init="map", verbose=True)
acc = bnn.evaluate(x_test[:2000], y_test[:2000], n_samples=50, batch_size=250, verbose=False)
print(f"MAP-init 60k full-batch HMC: {time.time()-t0:.1f}s  acc {acc:.2f}% (was ~10% random-init)", flush=True)
