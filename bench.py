"""Benchmark: SVI ELBO steps/sec on the north-star config (MNIST model_0).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

* value — jitted robustbnns_tpu SVI steps/sec on the default JAX backend (the
  real TPU chip when run by the driver); one step = one reparameterized ELBO
  gradient + Adam update on the conv-512 MNIST architecture at batch 128
  (reference hot loop ``model_bnn.py:316-325``).
* vs_baseline — ratio against a behaviourally-equivalent mean-field ELBO step
  implemented in torch on CPU, standing in for the Pyro-CPU reference (Pyro is
  not installed here; its SVI step is the same math — guide sample + ELBO
  backward + Adam — with effect-handler overhead on top, so this baseline is,
  if anything, generous to the reference).

Synthetic MNIST-shaped data is used (no network access for the real download);
shapes, dtypes and compute are identical to the real pipeline.
"""
import json
import os
import sys
import time

import numpy as np


def bench_jax(n_steps_timed: int = 300, batch_size: int = 128) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from robustbnns_tpu.inference.svi import _svi_epoch, init_meanfield
    from robustbnns_tpu.models.architectures import build_architecture

    arch = build_architecture("conv", "leaky", (28, 28, 1), 10, 512, "mnist")
    posterior = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))
    optimizer = optax.adam(0.01, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = optimizer.init(posterior)

    rng = np.random.default_rng(0)
    n = n_steps_timed * batch_size
    x = jnp.asarray(rng.random((n, 28, 28, 1), dtype=np.float32))
    y = jnp.asarray(
        np.eye(10, dtype=np.float32)[rng.integers(0, 10, size=n)]
    )

    def run(epoch):
        return _svi_epoch(
            arch.apply,
            optimizer,
            batch_size,
            0,  # pure ELBO step timing (no train-accuracy forwards)
            posterior,
            opt_state,
            x,
            y,
            jax.random.key(epoch),
        )

    # Warmup/compile. NOTE: block_until_ready does not reliably block on the
    # remote (axon) backend — force a device→host scalar transfer instead.
    out = run(0)
    float(out[2])

    t0 = time.perf_counter()
    out = run(1)
    float(out[2])
    dt = time.perf_counter() - t0
    return n_steps_timed / dt


def bench_torch_cpu(n_steps_timed: int = 4, batch_size: int = 128) -> float:
    """Mean-field ELBO step in torch on CPU — the Pyro-reference proxy."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    shapes = [
        (32, 1, 5, 5),
        (32,),
        (512, 32, 5, 5),
        (512,),
        (10, 7 * 7 * 512),
        (10,),
    ]
    locs = [torch.randn(s, requires_grad=True) for s in shapes]
    rhos = [torch.randn(s, requires_grad=True) for s in shapes]
    opt = torch.optim.Adam(locs + rhos, lr=0.01)

    x = torch.rand(batch_size, 1, 28, 28)
    yl = torch.randint(0, 10, (batch_size,))

    def step():
        opt.zero_grad()
        ws = [
            loc + F.softplus(rho) * torch.randn_like(loc)
            for loc, rho in zip(locs, rhos)
        ]
        h = F.leaky_relu(F.conv2d(x, ws[0], ws[1]))
        h = F.max_pool2d(h, 2)
        h = F.leaky_relu(F.conv2d(h, ws[2], ws[3]))
        h = F.max_pool2d(h, 2, stride=1)
        logits = F.linear(h.flatten(1), ws[4], ws[5])
        ll = -F.cross_entropy(logits, yl, reduction="sum")
        kl = sum(
            (0.5 * (F.softplus(r) ** 2 + l**2 - 1.0) - torch.log(F.softplus(r))).sum()
            for l, r in zip(locs, rhos)
        )
        loss = kl - ll
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps_timed):
        step()
    dt = time.perf_counter() - t0
    return n_steps_timed / dt


def main():
    # All human-readable output to stderr; the JSON line is the only stdout.
    jax_sps = bench_jax()
    print(f"jax: {jax_sps:.2f} steps/sec", file=sys.stderr)
    try:
        torch_sps = bench_torch_cpu()
        print(f"torch-cpu baseline: {torch_sps:.3f} steps/sec", file=sys.stderr)
        vs = jax_sps / torch_sps
    except Exception as e:  # torch missing/broken: report absolute only
        print(f"torch baseline failed: {e}", file=sys.stderr)
        vs = float("nan")
    print(
        json.dumps(
            {
                "metric": "SVI ELBO steps/sec (MNIST model_0 conv-512, batch 128)",
                "value": round(jax_sps, 2),
                "unit": "steps/sec",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
