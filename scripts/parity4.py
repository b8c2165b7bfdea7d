import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os
os.environ["ROBUSTBNNS_DATA_FALLBACK"] = "synthetic"
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)
from robustbnns_tpu.config import BNNConfig
from robustbnns_tpu.models import BNN
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.analysis import expected_loss_gradients
from robustbnns_tpu.experiments.gradients_figures import vanishing_gradients_heatmaps

t0 = time.time()
x_train, y_train, x_test, y_test, inp_shape, out = load_dataset("fashion_mnist", n_inputs=20000, shuffle=True, fallback="synthetic")
cfg = BNNConfig("fashion_mnist", 1024, "leaky", "fc2", "hmc", n_samples=100, warmup=50)
bnn = BNN.from_config(cfg, inp_shape, out).train(x_train, y_train, batch_size=5000, verbose=True)
t1 = time.time(); print(f"train: {t1-t0:.1f}s", flush=True)
acc = bnn.evaluate(x_test[:2000], y_test[:2000], n_samples=100, batch_size=250, verbose=False)
t2 = time.time(); print(f"eval (100 samp): {t2-t1:.1f}s acc {acc:.1f}%", flush=True)
n_list = [1, 10, 100]
grads = [np.asarray(expected_loss_gradients(bnn, x_test[:128], y_test[:128], n_samples=s, batch_size=128)).squeeze() for s in n_list]
t3 = time.time(); print(f"expected grads S=1,10,100 on 128 imgs: {t3-t2:.1f}s", flush=True)
paths = vanishing_gradients_heatmaps(x_test[:128], grads, n_list, "cfg4", plots_dir="parity_out/plots")
gn = [float(np.abs(g).max()) for g in grads]
print(f"CONFIG4 total {time.time()-t0:.1f}s  max|grad|: {[f'{v:.4f}' for v in gn]}  vanishing: {len(paths)}/128 heatmap rows saved", flush=True)
