import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os; os.environ["ROBUSTBNNS_DATA_FALLBACK"] = "synthetic"
import jax
print("backend:", jax.default_backend(), flush=True)
from robustbnns_tpu.config import multimodal_BNNs
import dataclasses
from robustbnns_tpu.experiments.multimodal import build_multimodal_df, plot_multimodal_kde

t0 = time.time()
cfg = dataclasses.replace(multimodal_BNNs["model_10"], n_samples=50)
n_inputs_list = [1000, 10000, 60000]
df = build_multimodal_df(cfg, n_inputs_list, n_samples=50, rel_path="parity_out/", train=True, evaluate=True, same_pca=False, verbose=True)
png = plot_multimodal_kde(df, n_inputs_list, "mnist_fc2_hmc_sepPCA", plots_dir="parity_out/plots")
print(f"MULTIMODAL total {time.time()-t0:.1f}s rows={len(df)} -> {png}", flush=True)
