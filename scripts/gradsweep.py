"""Reference-scale MNIST expected-gradients sweep (VERDICT round-1 item 4c).

The reference's gradients driver (``lossGradients.py:132-149``) loads BNN
model_0 and computes expected loss gradients at ``posterior_samples_list =
[1, 10, 50, 100]`` over 500 test inputs, then the figures driver builds the
component stripplot and vanishing-gradient heatmaps
(``plot_gradients_components.py:144-179``). This script runs exactly that
scale on the TPU: MNIST model_0 (conv-512 SVI) trained on 60k inputs
(synthetic surrogate on this offline box — identical shapes/preprocessing),
gradients persisted with the reference's ``_samp=<n>_lossGrads`` naming.

Run: ``python scripts/gradsweep.py`` (TPU; writes under gradsweep_out/).
"""
import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os
os.environ.setdefault("ROBUSTBNNS_DATA_FALLBACK", "synthetic")
import jax
import numpy as np

print("backend:", jax.default_backend(), flush=True)

from robustbnns_tpu.analysis import loss_gradients
from robustbnns_tpu.config import saved_BNNs
from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.experiments.gradients_figures import (
    stripplot_gradients_components,
    vanishing_gradients_heatmaps,
)
from robustbnns_tpu.models import BNN

OUT = "gradsweep_out/"
N_SAMPLES_LIST = [1, 10, 50, 100]  # lossGradients.py:132
N_TEST = 500  # lossGradients.py driver scale (VERDICT #4)

t0 = time.time()


def sweep(bnn, tag, x_test, y_test):
    xg, yg = x_test[:N_TEST], y_test[:N_TEST]
    grads_list = []
    for s in N_SAMPLES_LIST:
        ts = time.time()
        g = loss_gradients(
            bnn, xg, yg, n_samples=s, filename=tag, savedir=tag,
            rel_path=OUT, verbose=False,
        )
        grads_list.append(g)
        print(f"[{tag}] S={s}: {N_TEST} images in {time.time() - ts:.1f}s "
              f"(mean|g|={np.abs(g).mean():.2e})", flush=True)

    stripplot_gradients_components(
        grads_list, N_SAMPLES_LIST, bnn.config.dataset, tag,
        plots_dir=OUT + "plots",
    )
    # vanishing_gradients_heatmaps runs the detector internally — one heatmap
    # row per flagged image, so len(paths) IS the vanishing count.
    paths = vanishing_gradients_heatmaps(
        xg, grads_list, N_SAMPLES_LIST, tag, plots_dir=OUT + "plots"
    )
    print(f"[{tag}] vanishing {len(paths)}/{N_TEST} images (heatmaps saved)",
          flush=True)


cfg = saved_BNNs["model_0"]
x_train, y_train, x_test, y_test, inp_shape, out_size = load_dataset(
    cfg.dataset, n_inputs=60000, shuffle=True, fallback="synthetic"
)

# Reference-scale run: the full model_0 config (lossGradients.py:132-149).
bnn = BNN.from_config(cfg, inp_shape, out_size, n_inputs=60000)
bnn.train(x_train, y_train, verbose=True)
t1 = time.time()
print(f"model_0 SVI train (60k): {t1 - t0:.1f}s", flush=True)
acc = bnn.evaluate(x_test[:1000], y_test[:1000], n_samples=10, verbose=False)
print(f"clean acc (S=10): {acc:.1f}%", flush=True)
sweep(bnn, bnn.name, x_test, y_test)

# Non-saturated variant: the fully-trained model_0 drives CE to ~0 on the
# surrogate, so expected gradients are numerically zero at every S (the
# saturated extreme of the paper's vanishing-gradient claim). One epoch on
# 10k inputs leaves finite S=1 gradients for the detector/heatmaps.
import dataclasses

short_cfg = dataclasses.replace(cfg, epochs=1)
bnn_short = BNN.from_config(short_cfg, inp_shape, out_size, n_inputs=10000)
bnn_short.train(x_train[:10000], y_train[:10000], verbose=False)
acc = bnn_short.evaluate(x_test[:1000], y_test[:1000], n_samples=10, verbose=False)
print(f"short model clean acc (S=10): {acc:.1f}%", flush=True)
sweep(bnn_short, bnn_short.name + "_short", x_test, y_test)

print(f"GRADSWEEP total {time.time() - t0:.1f}s", flush=True)
