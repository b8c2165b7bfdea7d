"""North-star end-to-end on TPU: MNIST model_0 SVI train (60k) + Bayesian PGD
with 100 attack samples + 500-sample defence evaluation (BASELINE configs 3 +
north-star). Synthetic MNIST surrogate (no network)."""
import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os; os.environ["ROBUSTBNNS_DATA_FALLBACK"] = "synthetic"; os.environ["ROBUSTBNNS_FAST_PRNG"] = "1"
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.config import saved_BNNs
from robustbnns_tpu.models import BNN
from robustbnns_tpu.attacks import attack, attack_evaluation

t_start = time.time()
x_train, y_train, x_test, y_test, inp_shape, out = load_dataset("mnist", n_inputs=60000, shuffle=True, fallback="synthetic")
cfg = saved_BNNs["model_0"]
bnn = BNN.from_config(cfg, inp_shape, out)
t0 = time.time()
bnn.train(x_train, y_train, batch_size=128, train_acc_samples=10, verbose=False)
jax.block_until_ready(bnn.posterior.loc); _ = float(jnp.sum(bnn.posterior.loc[0]["w"]))
t_train = time.time() - t0
print(f"SVI train 5 epochs x 60k: {t_train:.1f}s  (history acc: {[f'{a:.1f}' for a in bnn.history['accuracy']]})", flush=True)

acc = bnn.evaluate(x_test, y_test, n_samples=10, verbose=False)
print(f"clean 10-sample predictive acc: {acc:.2f}%", flush=True)

xt, yt = x_test[:1000], y_test[:1000]
t0 = time.time()
x_adv = attack(bnn, xt, yt, method="pgd", epsilon=0.3, n_samples=100, save=False, verbose=False)
_ = float(jnp.sum(x_adv))
t_attack = time.time() - t0
print(f"Bayesian PGD (100 attack samples, 40 iters, 1000 imgs): {t_attack:.1f}s = {1000/t_attack:.1f} imgs/s", flush=True)

t0 = time.time()
oa, aa, rob = attack_evaluation(bnn, xt, x_adv, yt, n_samples=500, verbose=False)
t_eval = time.time() - t0
print(f"500-sample defence eval: {t_eval:.1f}s  clean {oa:.1f}% adv {aa:.1f}% rob {float(rob.mean()):.3f}", flush=True)
print(f"TOTAL end-to-end: {time.time()-t_start:.1f}s", flush=True)
