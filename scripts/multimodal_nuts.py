"""Multimodality experiment with NUTS (VERDICT round-1 item 6b re-run).

Round 1 showed plain fixed-trajectory HMC (the reference's engine choice)
cannot mix a 2M-parameter full-batch chain from a random init at 60k inputs
(~10% predictive accuracy; PERFORMANCE.md). `hmc_init="map"` was the round-1
mitigation; this run validates the round-2 NUTS sampler on the same
configuration from the reference's RANDOM init.

Run: ``python scripts/multimodal_nuts.py`` (TPU; writes under parity_out/).
"""
import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os; os.environ.setdefault("ROBUSTBNNS_DATA_FALLBACK", "synthetic")
import dataclasses

import jax

print("backend:", jax.default_backend(), flush=True)

from robustbnns_tpu.config import multimodal_BNNs
from robustbnns_tpu.experiments.multimodal import build_multimodal_df, plot_multimodal_kde

t0 = time.time()
cfg = dataclasses.replace(multimodal_BNNs["model_10"], n_samples=50)
n_inputs_list = [1000, 10000, 60000]
df = build_multimodal_df(
    cfg, n_inputs_list, n_samples=50, rel_path="parity_out/nuts_",
    train=True, evaluate=True, same_pca=False,
    hmc_sampler="nuts", hmc_init="random", verbose=True,
)
png = plot_multimodal_kde(
    df, n_inputs_list, "mnist_fc2_nuts_sepPCA", plots_dir="parity_out/plots"
)
print(f"MULTIMODAL-NUTS total {time.time()-t0:.1f}s rows={len(df)} -> {png}", flush=True)
