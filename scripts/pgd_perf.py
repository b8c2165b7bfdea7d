"""PGD throughput frontier: batch size x dtype sweep (TODO #6).

The Bayesian PGD attack is embarrassingly batch-parallel and leaves MXU
headroom at the bench's batch 1024 (PERFORMANCE.md). This sweeps batch size
and the bf16 matmul knob at the bench configuration (fc2-512, 40 iters,
S=10 fresh draws/iter) to find the single-chip throughput ceiling.

Run: ``python scripts/pgd_perf.py`` (TPU).
"""
import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import os

os.environ.setdefault("ROBUSTBNNS_FAST_PRNG", "1")

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

from robustbnns_tpu.attacks.gradient_attacks import pgd_attack
from robustbnns_tpu.inference.svi import init_meanfield
from robustbnns_tpu.models.architectures import build_architecture
from robustbnns_tpu.predict import svi_predict


def bench(batch_size: int, n_images: int, bf16: bool) -> float:
    if bf16:
        os.environ["ROBUSTBNNS_BF16"] = "1"
    else:
        os.environ.pop("ROBUSTBNNS_BF16", None)

    arch = build_architecture("fc2", "leaky", (28, 28, 1), 10, 512)
    posterior = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))

    def forward(xb, key):
        return svi_predict(arch, posterior, xb, jax.random.split(key, 10))

    forward._rbnn_takes_key = True

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n_images, 28, 28, 1), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=n_images), jnp.int32)

    def run(key):
        outs = []
        for i in range(0, n_images, batch_size):
            outs.append(pgd_attack(
                forward, x[i : i + batch_size], y[i : i + batch_size],
                epsilon=0.3, key=jax.random.fold_in(key, i),
            ))
        return jnp.concatenate(outs)

    float(jnp.sum(run(jax.random.key(3))))  # compile + sync
    t0 = time.perf_counter()
    float(jnp.sum(run(jax.random.key(4))))
    return n_images / (time.perf_counter() - t0)


best = (0.0, None)
for bf16 in (False, True):
    for bs in (1024, 2048, 4096):
        rate = bench(bs, max(4 * bs, 4096), bf16)
        tag = f"batch {bs:5d} {'bf16' if bf16 else 'f32 '}"
        print(f"{tag}: {rate:9.0f} imgs/s", flush=True)
        if rate > best[0]:
            best = (rate, tag)
print(f"BEST: {best[1]} -> {best[0]:.0f} imgs/s", flush=True)
