"""Benchmark: the three BASELINE throughput metrics on the default backend.

Prints ONE JSON line with the headline metric (SVI ELBO steps/sec on the
north-star MNIST model_0 config) plus an ``extras`` object carrying the other
two BASELINE metrics (HMC leapfrog steps/sec, Bayesian PGD images/sec), each
with its own torch-CPU baseline ratio:

    {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N,
     "extras": {...}}

Honesty rules (VERDICT r2 weak #2 / missing #3):

* every headline number runs the FRAMEWORK DEFAULTS — threefry PRNG, and
  for the samplers the ``"high"`` (bf16_3x) matmul precision that the
  round-5 precision study validated against full f32 (PERFORMANCE.md); the
  opt-in paths (``ROBUSTBNNS_FAST_PRNG=1`` rbg PRNG, ``ROBUSTBNNS_BF16=1``
  matmuls, single-pass-bf16 and strict-f32 sampler precisions) are measured
  separately and labeled as such in extras;
* each metric also reports achieved FLOP/s and MFU against the chip's
  published bf16 peak (v5e: 197 TFLOP/s) with FLOP counts from XLA's own cost
  model — "fast vs a 1-vCPU torch proxy" is not "fast vs the hardware";
* baselines are behaviourally-equivalent torch-CPU implementations of the
  same math (Pyro is not installed; its SVI/HMC/PGD do the same tensor work
  plus effect-handler overhead, so these baselines are generous to the
  reference). Synthetic MNIST-shaped data (no network access); shapes match
  the real pipeline. See BASELINE.md.
"""
import json
import math
import os
import sys
import time

import numpy as np

# Chip peak for the MFU denominator: TPU v5e publishes 197 TFLOP/s bf16.
# One denominator for all paths (scaling-book convention); f32 paths cannot
# reach 100% by construction (the MXU is a bf16 engine), which is part of
# what the number is for — it shows what switching the matmul dtype buys.
PEAK_FLOPS = 197e12


def _sync(x):
    """Force completion via a host transfer — block_until_ready does not
    reliably block on the remote (axon) TPU backend."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _cost_flops(jitted_fn, *args, **kwargs):
    """FLOPs of one call of a jitted function, from XLA's cost model.

    AOT-lowers and compiles (cache-warm shapes hit the compile cache). Returns
    NaN when the backend doesn't expose a cost analysis.
    """
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception as e:
        print(f"cost analysis unavailable: {type(e).__name__}: {e}", file=sys.stderr)
        return float("nan")


# --------------------------------------------------------------------------- #
# JAX measurements (run on the default backend — real TPU under the driver)
# --------------------------------------------------------------------------- #


def bench_jax_svi(
    n_steps_timed: int = 300, batch_size: int = 128, train_acc_samples: int = 0,
    train_acc_bf16: bool = False, with_flops: bool = False,
):
    """Jitted SVI ELBO steps/sec, conv-512 MNIST at batch 128
    (reference hot loop ``model_bnn.py:316-325``).

    ``train_acc_samples=0`` measures the pure ELBO step;
    ``train_acc_samples=10`` is the FAITHFUL epoch — the reference runs a
    10-guide-trace posterior predictive per batch for train accuracy
    (``model_bnn.py:327``), which dominates its hot loop (SURVEY §3.1).
    """
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
    y = jnp.asarray(np.eye(10, dtype=np.float32)[rng.integers(0, 10, size=n)])

    from robustbnns_tpu.utils.prng import make_key

    def run(epoch):
        return _svi_epoch(
            arch.apply, optimizer, batch_size, train_acc_samples,
            posterior, opt_state, x, y,
            jax.random.fold_in(make_key(0), epoch),
            train_acc_bf16=train_acc_bf16,
        )

    _sync(run(0)[2])  # compile
    t0 = time.perf_counter()
    _sync(run(1)[2])
    rate = n_steps_timed / (time.perf_counter() - t0)
    if not with_flops:
        return rate
    # FLOPs of ONE step: cost a single-batch epoch (scan of length 1). XLA's
    # cost model counts a scan body ONCE regardless of trip count (verified:
    # scripts/roofline.py scan_trip_count), so costing the full epoch and
    # dividing by n_steps under-reports by the trip count — BENCH_r03's
    # svi_mfu=0.05% was exactly that bug (actual ~300x higher).
    flops_per_step = _cost_flops(
        _svi_epoch, arch.apply, optimizer, batch_size, train_acc_samples,
        posterior, opt_state, x[:batch_size], y[:batch_size],
        jax.random.fold_in(make_key(0), 0),
    )
    return rate, flops_per_step


def bench_jax_hmc(
    batch: int = 5000, n_samples: int = 30, num_steps: int = 10,
    precision: str = None, with_flops: bool = False,
):
    """HMC leapfrog steps/sec: fc2-512 MNIST model_1 shape, full 5000-image
    batch (reference ``model_bnn.py:269-277`` — each leapfrog step is a
    full-batch forward+backward).

    ``precision=None`` follows the sampler default ("high" bf16_3x since
    round 5 — single-pass bf16 collapses MCMC adaptation on sharp posteriors,
    see HMCConfig); the ``"default"`` and strict-f32 ``"highest"`` variants
    are reported as labeled extras.
    """
    import jax
    import jax.numpy as jnp

    from robustbnns_tpu.inference.hmc import (
        MCMC_PRECISION_DEFAULT,
        HMCConfig,
        hmc_sample,
    )

    from robustbnns_tpu.models.architectures import build_architecture
    from robustbnns_tpu.utils.pytree import flatten_tree_to_vector

    if precision is None:
        precision = MCMC_PRECISION_DEFAULT
    arch = build_architecture("fc2", "leaky", (28, 28, 1), 10, 512)
    flat0, unravel = flatten_tree_to_vector(arch.init(jax.random.key(0)))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 28, 28, 1), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 10, size=batch), jnp.int32)

    def potential(q):
        logits = arch.apply(unravel(q), x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.sum(jnp.take_along_axis(logp, labels[:, None], axis=-1))
        return 0.5 * jnp.sum(q * q) - ll

    warmup = 5
    cfg = HMCConfig(
        num_samples=n_samples, warmup=warmup, step_size=1e-4,
        num_steps=num_steps, adapt_step_size=False, adapt_mass_matrix=False,
        precision=precision,
    )
    samples, info = hmc_sample(potential, flat0, jax.random.key(1), cfg)
    _sync(samples)  # compile + run once
    t0 = time.perf_counter()
    samples, info = hmc_sample(potential, flat0, jax.random.key(2), cfg)
    _sync(samples)
    dt = time.perf_counter() - t0
    total_leapfrog = (n_samples + warmup) * num_steps
    rate = total_leapfrog / dt
    if not with_flops:
        return rate
    # One leapfrog step ≈ one potential gradient (full-batch forward+backward);
    # the vector half-steps are noise next to the matmuls. Probe at the same
    # matmul precision the sampler ran so the FLOP count matches the path.
    @jax.jit
    def grad_probe(q):
        with jax.default_matmul_precision(precision):
            return jax.grad(potential)(q)

    flops_per_leapfrog = _cost_flops(grad_probe, flat0)
    return rate, flops_per_leapfrog


def bench_jax_pgd(
    n_images: int = 4096, batch_size: int = 2048, n_attack_samples: int = 10,
    with_flops: bool = False,
):
    """Bayesian PGD test images/sec: 40 iterations × 10 fresh posterior draws
    per iteration, fc2-512 (reference ``adversarialAttacks.py:86-108``).

    Batch 2048 — the attack is embarrassingly batch-parallel; the measured
    single-chip frontier is 5.1k → 19.2k → 41k imgs/s at batch 128/1024/2048
    (f32; `scripts/pgd_perf.py` sweeps the frontier, bf16 adds ~16%).

    NOTE (env-dependent paths): each call builds a FRESH ``forward`` closure,
    so the jitted ``_pgd_batch`` (whose cache keys on the closure object)
    retraces per call and re-reads ``ROBUSTBNNS_BF16`` at trace time — that
    retrace is what makes the bf16/f32 and rbg/threefry variants in ``main``
    measure what they claim. If ``forward`` is ever hoisted/memoized across
    calls, an env flip between calls would be silently ignored.
    """
    import jax
    import jax.numpy as jnp

    from robustbnns_tpu.attacks.gradient_attacks import pgd_attack
    from robustbnns_tpu.inference.svi import init_meanfield
    from robustbnns_tpu.models.architectures import build_architecture
    from robustbnns_tpu.predict import svi_predict
    from robustbnns_tpu.utils.prng import make_key

    arch = build_architecture("fc2", "leaky", (28, 28, 1), 10, 512)
    posterior = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))

    def forward(xb, key):
        return svi_predict(
            arch, posterior, xb, jax.random.split(key, n_attack_samples)
        )

    forward._rbnn_takes_key = True

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n_images, 28, 28, 1), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=n_images), jnp.int32)

    def run(key):
        outs = []
        for i in range(0, n_images, batch_size):
            outs.append(
                pgd_attack(
                    forward, x[i : i + batch_size], y[i : i + batch_size],
                    epsilon=0.3, key=jax.random.fold_in(key, i),
                )
            )
        return jnp.concatenate(outs)

    # make_key honors ROBUSTBNNS_FAST_PRNG — the key's impl (threefry/rbg)
    # propagates through every split inside the attack program.
    _sync(run(make_key(3)))  # compile
    t0 = time.perf_counter()
    _sync(run(make_key(4)))
    rate = n_images / (time.perf_counter() - t0)
    if not with_flops:
        return rate
    from robustbnns_tpu.attacks.gradient_attacks import _pgd_batch
    from robustbnns_tpu.predict import normalize_forward

    alpha = jnp.full((batch_size,) + (1,) * 3, 2.0, jnp.float32)
    # Cost ONE iteration (scan of length 1) and scale by the 40 the attack
    # actually runs: XLA's cost model counts a scan body once regardless of
    # trip count (scripts/roofline.py scan_trip_count), so costing iters=40
    # yields one body and BENCH_r03's pgd_mfu under-reported 40x.
    flops_per_image = (
        _cost_flops(
            _pgd_batch, normalize_forward(forward), 1, x[:batch_size],
            y[:batch_size], 0.3, alpha, make_key(0),
        )
        * 40
        / batch_size
    )
    return rate, flops_per_image


def bench_jax_nuts(
    batch: int = 60000, n_draws: int = 8, max_depth: int = 8,
    with_flops: bool = False, repeats: int = 1,
):
    """NUTS gradient-evals/sec on the multimodal flagship config: fc2-512,
    full 60k-image batch (the framework's beyond-reference engine —
    PERFORMANCE.md "NUTS closes the HMC mixing gap").

    Measured in the saturated regime: fixed tiny step so every draw integrates
    to ``max_depth`` (2^8−1 = 255 leapfrog leaves), making the metric pure
    sustained gradient throughput — each eval is one full-batch
    forward+backward — rather than a function of trajectory shape. The eval
    count comes from the sampler's own ``num_leapfrog`` accounting.
    """
    import jax
    import jax.numpy as jnp

    from robustbnns_tpu.inference.nuts import NUTSConfig, nuts_sample
    from robustbnns_tpu.models.architectures import build_architecture
    from robustbnns_tpu.utils.pytree import flatten_tree_to_vector

    arch = build_architecture("fc2", "leaky", (28, 28, 1), 10, 512)
    flat0, unravel = flatten_tree_to_vector(arch.init(jax.random.key(0)))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 28, 28, 1), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 10, size=batch), jnp.int32)

    def potential(q, x, labels):
        logits = arch.apply(unravel(q), x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.sum(jnp.take_along_axis(logp, labels[:, None], axis=-1))
        return 0.5 * jnp.sum(q * q) - ll

    cfg = NUTSConfig(
        num_samples=n_draws, warmup=0, step_size=1e-5, max_depth=max_depth,
        adapt_step_size=False, adapt_mass_matrix=False,
    )

    def run(seed):
        samples, info = nuts_sample(
            potential, flat0, jax.random.key(seed), cfg, data=(x, labels)
        )
        return samples, float(jnp.sum(info.num_leapfrog))

    run(1)  # compile
    # Median of `repeats` timed windows over the ONE compiled executable
    # (a fresh bench_jax_nuts call would rebuild the potential closure and
    # recompile the chunked driver; repeating the window inside is what
    # keeps medians cheap here, like jmed does for the other metrics).
    rates = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        samples, evals = run(2 + rep)
        _sync(samples)
        rates.append(evals / (time.perf_counter() - t0))
    rate = float(np.median(rates))
    if not with_flops:
        return rate

    @jax.jit
    def grad_probe(q):  # same matmul precision as the sampler path
        with jax.default_matmul_precision(cfg.precision):
            return jax.grad(lambda q: potential(q, x, labels))(q)

    flops_per_eval = _cost_flops(grad_probe, flat0)
    return rate, flops_per_eval


# --------------------------------------------------------------------------- #
# torch-CPU baselines (the Pyro-reference proxies)
# --------------------------------------------------------------------------- #


def _torch_fc2(ws, x, act):
    import torch.nn.functional as F

    h = act(F.linear(x, ws[0], ws[1]))
    h = act(F.linear(h, ws[2], ws[3]))
    return F.linear(h, ws[4], ws[5])


def bench_torch_svi(
    n_steps: int = 4, batch_size: int = 128, train_acc_samples: int = 0
) -> float:
    """Mean-field ELBO step on conv-512 (same math as ``model_bnn.py:303-325``).

    ``train_acc_samples=10`` adds the reference's per-batch 10-sample
    posterior-predictive forward (``model_bnn.py:327``) — the faithful epoch.
    """
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    shapes = [
        (32, 1, 5, 5), (32,), (512, 32, 5, 5), (512,),
        (10, 7 * 7 * 512), (10,),
    ]
    locs = [torch.randn(s, requires_grad=True) for s in shapes]
    rhos = [torch.randn(s, requires_grad=True) for s in shapes]
    opt = torch.optim.Adam(locs + rhos, lr=0.01)
    x = torch.rand(batch_size, 1, 28, 28)
    yl = torch.randint(0, 10, (batch_size,))

    def net(ws, x):
        h = F.leaky_relu(F.conv2d(x, ws[0], ws[1]))
        h = F.max_pool2d(h, 2)
        h = F.leaky_relu(F.conv2d(h, ws[2], ws[3]))
        h = F.max_pool2d(h, 2, stride=1)
        return F.linear(h.flatten(1), ws[4], ws[5])

    def step():
        opt.zero_grad()
        ws = [l + F.softplus(r) * torch.randn_like(l) for l, r in zip(locs, rhos)]
        logits = net(ws, x)
        ll = -F.cross_entropy(logits, yl, reduction="sum")
        kl = sum(
            (0.5 * (F.softplus(r) ** 2 + l**2 - 1.0) - torch.log(F.softplus(r))).sum()
            for l, r in zip(locs, rhos)
        )
        (kl - ll).backward()
        opt.step()
        if train_acc_samples:
            with torch.no_grad():
                probs = torch.stack([
                    F.softmax(net([l + F.softplus(r) * torch.randn_like(l)
                                   for l, r in zip(locs, rhos)], x), -1)
                    for _ in range(train_acc_samples)
                ]).mean(0)
                (probs.argmax(-1) == yl).float().mean()

    step()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    return n_steps / (time.perf_counter() - t0)


def bench_torch_hmc(batch: int = 5000, n_leapfrog: int = 8) -> float:
    """Leapfrog steps/sec on fc2-512 with a full 5000-image batch."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    shapes = [(512, 784), (512,), (512, 512), (512,), (10, 512), (10,)]
    q = [torch.randn(s) * 0.05 for s in shapes]
    x = torch.rand(batch, 784)
    yl = torch.randint(0, 10, (batch,))
    act = lambda v: F.leaky_relu(v)

    def grad_u(q):
        qs = [t.detach().requires_grad_(True) for t in q]
        logits = _torch_fc2(qs, x, act)
        ll = -F.cross_entropy(logits, yl, reduction="sum")
        u = -(ll - 0.5 * sum((t**2).sum() for t in qs))
        u.backward()
        return [t.grad for t in qs]

    p = [torch.randn_like(t) for t in q]
    eps = 1e-4
    grad_u(q)  # warm
    t0 = time.perf_counter()
    for _ in range(n_leapfrog):
        g = grad_u(q)
        p = [pi - eps * gi for pi, gi in zip(p, g)]
        q = [qi + eps * pi for qi, pi in zip(q, p)]
    return n_leapfrog / (time.perf_counter() - t0)


def bench_torch_pgd(n_images: int = 2, n_samples: int = 10, iters: int = 40) -> float:
    """Reference-style one-image-at-a-time Bayesian PGD
    (``adversarialAttacks.py:118`` loop) on fc2-512."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    shapes = [(512, 784), (512,), (512, 512), (512,), (10, 512), (10,)]
    locs = [torch.randn(s) for s in shapes]
    rhos = [torch.randn(s) for s in shapes]
    act = lambda v: F.leaky_relu(v)

    def forward(x):
        preds = []
        for _ in range(n_samples):
            ws = [l + F.softplus(r) * torch.randn_like(l) for l, r in zip(locs, rhos)]
            preds.append(F.softmax(_torch_fc2(ws, x, act), dim=-1))
        return torch.stack(preds).mean(0)

    imgs = torch.rand(n_images, 784)
    labels = torch.zeros(n_images, dtype=torch.long)

    t0 = time.perf_counter()
    for idx in range(n_images):
        image = imgs[idx : idx + 1].clone()
        original = image.clone()
        for _ in range(iters):
            image.requires_grad_(True)
            out = forward(image)
            loss = F.cross_entropy(out, labels[idx : idx + 1])
            loss.backward()
            with torch.no_grad():
                adv = image + 2.0 * image.grad.sign()
                eta = torch.clamp(adv - original, -0.3, 0.3)
                image = torch.clamp(original + eta, 0, 1)
    return n_images / (time.perf_counter() - t0)


BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "bench_baselines.json"
)
_BASELINE_KEYS = ("svi", "svi_faithful", "hmc", "pgd", "pgd100", "nuts_grad")


def compute_torch_baselines() -> dict:
    """Measure the six torch-CPU reference proxies (median of 3 each)."""

    def median3(fn, *a, **kw):
        vals = []
        for _ in range(3):
            try:
                vals.append(fn(*a, **kw))
            except Exception as e:
                print(f"baseline {fn.__name__} failed: {e}", file=sys.stderr)
                return float("nan")
        return float(np.median(vals))

    out = {
        "svi": median3(bench_torch_svi),
        "svi_faithful": median3(bench_torch_svi, train_acc_samples=10),
        "hmc": median3(bench_torch_hmc),
        "pgd": median3(bench_torch_pgd),
        "pgd100": median3(bench_torch_pgd, n_images=1, n_samples=100),
    }
    try:
        # Single run — one full-batch 60k gradient eval takes ~0.5-1 min on
        # this 1-vCPU box; the ratio is orders of magnitude, noise immaterial.
        out["nuts_grad"] = bench_torch_hmc(batch=60000, n_leapfrog=1)
    except Exception as e:
        print(f"baseline torch nuts-grad failed: {e}", file=sys.stderr)
        out["nuts_grad"] = float("nan")
    out["median_of"] = 3
    out["computed_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    return out


def torch_baselines() -> tuple:
    """Load the torch-CPU proxies from cache, computing them only on a miss.

    The proxies are fixed-shape CPU workloads on a fixed machine — reruns add
    nothing but tens of contended 1-vCPU minutes, which is exactly what
    starved the round-4 driver capture of its JSON line (BENCH_r04
    rc=124/parsed=null). First computation persists to
    ``data/bench_baselines.json``; later runs reuse it. Delete the file or set
    ``ROBUSTBNNS_BENCH_REFRESH_BASELINES=1`` to remeasure.

    Returns ``(baselines_dict, cached: bool)``.
    """
    refresh = os.environ.get("ROBUSTBNNS_BENCH_REFRESH_BASELINES") == "1"
    if not refresh and os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                b = json.load(f)
            missing = [
                k for k in _BASELINE_KEYS
                if not isinstance(b.get(k), (int, float)) or math.isnan(b[k])
            ]
            if not missing:
                print(
                    f"torch-cpu baselines: cached ({BASELINE_CACHE}, "
                    f"computed {b.get('computed_at')})",
                    file=sys.stderr,
                )
                return b, True
            print(
                f"baseline cache incomplete (missing {missing}); recomputing",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"baseline cache unreadable ({e}); recomputing", file=sys.stderr)
    b = compute_torch_baselines()
    try:
        os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
        tmp = BASELINE_CACHE + ".tmp"
        with open(tmp, "w") as f:
            json.dump(b, f, indent=1)
        os.replace(tmp, BASELINE_CACHE)
        print(f"torch-cpu baselines: computed and cached to {BASELINE_CACHE}",
              file=sys.stderr)
    except Exception as e:
        print(f"baseline cache write failed: {e}", file=sys.stderr)
    return b, False


def main():
    # ROBUSTBNNS_PROFILE=<dir>: wrap the JAX measurements in a jax.profiler
    # trace for TensorBoard/XProf inspection.
    import contextlib

    if "--baselines-only" in sys.argv:
        # Populate/refresh the cache without touching JAX (safe to run while
        # a TPU job owns the tunnel — torch-CPU only).
        os.environ["ROBUSTBNNS_BENCH_REFRESH_BASELINES"] = "1"
        b, _ = torch_baselines()
        print(json.dumps({"baselines": b}))
        return

    trace_dir = os.environ.get("ROBUSTBNNS_PROFILE")
    ctx = contextlib.nullcontext()
    if trace_dir:
        import jax

        ctx = jax.profiler.trace(trace_dir)
    def mfu(rate, flops_per_unit):
        return rate * flops_per_unit / PEAK_FLOPS

    # Chip-share timing variance is ±10-20% (CLAUDE.md), with occasional
    # cold-chip outliers far outside that band (round 5 observed a NUTS
    # first-measurement at 0.57× its own steady state): report every JAX
    # default-path metric as the median of REPEATS runs. Executables are
    # jit-cached after the first call, so repeats cost only the timed
    # windows (seconds each).
    repeats = int(os.environ.get("ROBUSTBNNS_BENCH_REPEATS", "3"))

    def jmed(fn, **kw):
        rate, flops = fn(with_flops=True, **kw)
        rates = [rate] + [fn(**kw) for _ in range(repeats - 1)]
        return float(np.median(rates)), flops

    with ctx:
        # ---- framework-default paths (threefry PRNG; samplers at the
        # round-5-validated "high" bf16_3x matmul precision) ----------------
        jax_svi, svi_flops = jmed(bench_jax_svi)
        print(
            f"jax svi: {jax_svi:.1f} steps/s "
            f"({mfu(jax_svi, svi_flops) * 100:.1f}% MFU)",
            file=sys.stderr,
        )
        jax_svi_faithful = float(np.median(
            [bench_jax_svi(train_acc_samples=10) for _ in range(repeats)]
        ))
        print(
            f"jax svi faithful (10-sample train acc/batch): "
            f"{jax_svi_faithful:.1f} steps/s",
            file=sys.stderr,
        )
        from robustbnns_tpu.inference.hmc import MCMC_PRECISION_DEFAULT

        jax_hmc, hmc_flops = jmed(bench_jax_hmc)
        print(
            f"jax hmc leapfrog ({MCMC_PRECISION_DEFAULT}-precision default): "
            f"{jax_hmc:.1f} steps/s "
            f"({mfu(jax_hmc, hmc_flops) * 100:.1f}% MFU)",
            file=sys.stderr,
        )
        jax_pgd, pgd_flops = jmed(bench_jax_pgd)
        print(
            f"jax bayesian pgd (S=10): {jax_pgd:.1f} imgs/s "
            f"({mfu(jax_pgd, pgd_flops) * 100:.1f}% MFU)",
            file=sys.stderr,
        )
        jax_pgd_100, pgd100_flops = jmed(
            bench_jax_pgd,
            n_images=4096, batch_size=2048, n_attack_samples=100,
        )
        print(
            f"jax bayesian pgd (S=100): {jax_pgd_100:.1f} imgs/s "
            f"({mfu(jax_pgd_100, pgd100_flops) * 100:.1f}% MFU)",
            file=sys.stderr,
        )
        jax_nuts, nuts_flops = bench_jax_nuts(with_flops=True, repeats=repeats)
        print(
            f"jax nuts gradient evals (fc2-512, 60k full batch): "
            f"{jax_nuts:.1f} evals/s ({mfu(jax_nuts, nuts_flops) * 100:.1f}% MFU)",
            file=sys.stderr,
        )

        # ---- labeled opt-in precision variants ------------------------------
        # MCMC with XLA's default (single-pass bf16) matmuls — valid only
        # where the posterior tolerates the Hamiltonian noise (collapses NUTS
        # adaptation; see HMCConfig.precision), and with strict-f32 "highest"
        # — the pre-round-5 default, for bit-level Pyro-parity work.
        jax_hmc_fastmm = bench_jax_hmc(precision="default")
        print(
            f"jax hmc leapfrog (opt-in default-precision matmuls): "
            f"{jax_hmc_fastmm:.1f} steps/s",
            file=sys.stderr,
        )
        jax_hmc_f32 = bench_jax_hmc(precision="highest")
        print(
            f"jax hmc leapfrog (opt-in strict-f32 'highest'): "
            f"{jax_hmc_f32:.1f} steps/s",
            file=sys.stderr,
        )
        os.environ["ROBUSTBNNS_BF16"] = "1"  # perf mode: bf16 MXU matmuls
        jax_pgd_bf16 = bench_jax_pgd()
        os.environ.pop("ROBUSTBNNS_BF16", None)
        print(f"jax bayesian pgd (opt-in bf16): {jax_pgd_bf16:.1f} imgs/s",
              file=sys.stderr)
        os.environ["ROBUSTBNNS_FAST_PRNG"] = "1"  # opt-in rbg PRNG
        jax_svi_fast = bench_jax_svi()
        jax_pgd_fast = bench_jax_pgd()
        os.environ.pop("ROBUSTBNNS_FAST_PRNG", None)
        print(
            f"jax opt-in fast-PRNG (rbg): svi {jax_svi_fast:.1f} steps/s, "
            f"pgd {jax_pgd_fast:.1f} imgs/s",
            file=sys.stderr,
        )
        # opt-in bf16 train-accuracy predictive (metric-only, argmax-stable);
        # the ELBO step stays f32 — see inference.svi._svi_epoch.
        jax_svi_faithful_bf16acc = bench_jax_svi(
            train_acc_samples=10, train_acc_bf16=True
        )
        print(
            f"jax svi faithful (opt-in bf16 train-acc): "
            f"{jax_svi_faithful_bf16acc:.1f} steps/s",
            file=sys.stderr,
        )

    baselines, baselines_cached = torch_baselines()
    t_svi = baselines["svi"]
    t_svi_faithful = baselines["svi_faithful"]
    t_hmc = baselines["hmc"]
    t_pgd = baselines["pgd"]
    t_pgd_100 = baselines["pgd100"]
    t_nuts = baselines["nuts_grad"]

    def ratio(num, den):
        """None (strict-JSON null) when the torch baseline failed as NaN."""
        return None if (math.isnan(den) or den == 0) else round(num / den, 2)

    print(
        f"torch-cpu medians: svi {t_svi:.3f} steps/s, faithful {t_svi_faithful:.3f}, "
        f"hmc {t_hmc:.2f} steps/s, pgd {t_pgd:.4f} imgs/s, "
        f"pgd100 {t_pgd_100:.4f} imgs/s, nuts-grad {t_nuts:.3f} evals/s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "SVI ELBO steps/sec (MNIST model_0 conv-512, batch 128)",
                "value": round(jax_svi, 2),
                "unit": "steps/sec",
                "vs_baseline": ratio(jax_svi, t_svi),
                "extras": {
                    "svi_faithful_steps_per_sec": round(jax_svi_faithful, 2),
                    "svi_faithful_vs_torch_cpu": ratio(
                        jax_svi_faithful, t_svi_faithful
                    ),
                    "hmc_leapfrog_steps_per_sec": round(jax_hmc, 2),
                    "hmc_vs_torch_cpu": ratio(jax_hmc, t_hmc),
                    "bayesian_pgd_images_per_sec": round(jax_pgd, 2),
                    "pgd_vs_torch_cpu": ratio(jax_pgd, t_pgd),
                    "bayesian_pgd100_images_per_sec": round(jax_pgd_100, 2),
                    "pgd100_vs_torch_cpu": ratio(jax_pgd_100, t_pgd_100),
                    "nuts_gradient_evals_per_sec": round(jax_nuts, 2),
                    "nuts_vs_torch_cpu": ratio(jax_nuts, t_nuts),
                    # Achieved FLOP/s and MFU vs the v5e bf16 peak (197
                    # TFLOP/s); FLOP counts from XLA's cost model. Headline
                    # paths are f32, which caps their reachable MFU.
                    "svi_achieved_tflops": round(jax_svi * svi_flops / 1e12, 2),
                    "svi_mfu": round(mfu(jax_svi, svi_flops), 4),
                    "hmc_achieved_tflops": round(jax_hmc * hmc_flops / 1e12, 2),
                    "hmc_mfu": round(mfu(jax_hmc, hmc_flops), 4),
                    "pgd_achieved_tflops": round(jax_pgd * pgd_flops / 1e12, 2),
                    "pgd_mfu": round(mfu(jax_pgd, pgd_flops), 4),
                    "pgd100_achieved_tflops": round(
                        jax_pgd_100 * pgd100_flops / 1e12, 2
                    ),
                    "pgd100_mfu": round(mfu(jax_pgd_100, pgd100_flops), 4),
                    "nuts_achieved_tflops": round(jax_nuts * nuts_flops / 1e12, 2),
                    "nuts_mfu": round(mfu(jax_nuts, nuts_flops), 4),
                    "mfu_peak_flops": PEAK_FLOPS,
                    # Labeled opt-in fast paths (NOT the framework defaults):
                    "optin_bf16_pgd_images_per_sec": round(jax_pgd_bf16, 2),
                    "optin_fast_matmul_hmc_steps_per_sec": round(jax_hmc_fastmm, 2),
                    "optin_f32_highest_hmc_steps_per_sec": round(jax_hmc_f32, 2),
                    "mcmc_precision_default": MCMC_PRECISION_DEFAULT,
                    "optin_bf16_trainacc_faithful_steps_per_sec": round(
                        jax_svi_faithful_bf16acc, 2
                    ),
                    "optin_fast_prng_svi_steps_per_sec": round(jax_svi_fast, 2),
                    "optin_fast_prng_pgd_images_per_sec": round(jax_pgd_fast, 2),
                    "torch_baselines_median_of": baselines.get("median_of", 3),
                    "torch_baselines_cached": baselines_cached,
                    "torch_baselines_computed_at": baselines.get("computed_at"),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
