"""Roofline measurements: what actually bounds each bench metric (VERDICT r3 #4).

BENCH_r03 reports MFU per metric (SVI 0.05%, PGD 0.6-0.8%, NUTS 4.9%, HMC
10.0%) but no analysis. This script produces the measurements behind the
PERFORMANCE.md roofline section:

1. **Cost-model cross-check** — XLA's ``cost_analysis()`` FLOP count vs an
   analytic hand count for the conv-512 forward and the fc2-512 potential
   gradient. If they disagree, the published MFU numbers are wrong, not the
   hardware.
2. **Dispatch floor** — round-trip latency of a trivial jitted op on the
   (remote axon) backend; any metric whose per-dispatch work is O(floor) is
   dispatch-bound, not hardware-bound.
3. **SVI batch sweep** — steps/s and imgs/s at batch 128/512/2048 (reference
   pins batch=128, ``model_bnn.py:403``): flat steps/s => per-step serial
   latency (small-kernel/dispatch) binds; rising imgs/s => batch 128 simply
   underfills the chip.
4. **PGD decomposition** — per-iteration unit broken into weight-draw noise
   generation vs forward vs CE-grad, at the bench shape (fc2-512, S=10,
   batch 2048). Each unit is timed AMORTIZED (scanned 64× inside one jit,
   carry-threaded so XLA cannot hoist it) — the round-5 first run showed
   single-dispatch unit timings on this box measure only the ~27.6 ms
   remote-tunnel floor.
5. **NUTS chunk ablation + HMC apples-to-apples** — NUTS grad-evals/s at
   dispatch chunk sizes 5/20/80 and plain-HMC leapfrog/s on the SAME 60k
   batch: separates chunked-dispatch overhead from tree bookkeeping in the
   NUTS-4.9%-vs-HMC-10% gap.

Run (TPU, ~15-25 min): ``python -u scripts/roofline.py > roofline.log 2>&1``
Output: ``data/roofline.json`` + readable stdout. Medians of 3 where cheap.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ROBUSTBNNS_DATA_FALLBACK", "synthetic")

import jax

QUICK = "--quick" in sys.argv
if QUICK:  # tiny CPU shakeout of the plumbing (not a measurement)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

from bench import PEAK_FLOPS, _cost_flops, bench_jax_hmc, bench_jax_nuts, bench_jax_svi

RESULTS = {}


def sync(x) -> float:
    return float(jnp.sum(x))


def median3(fn):
    return float(np.median([fn() for _ in range(3)]))


# --------------------------------------------------------------------------- #
# 1. cost-model cross-check
# --------------------------------------------------------------------------- #


def conv512_analytic_flops(batch: int) -> float:
    """Forward FLOPs of the reference conv arch (model_nn.py:93-106) on MNIST:
    Conv(1->32,k5,valid) 28->24, pool2 ->12, Conv(32->512,k5,valid) 12->8,
    pool(2,s1) ->7, Linear(7*7*512 -> 10). 2 FLOPs per MAC."""
    c1 = 2 * batch * 24 * 24 * 32 * (1 * 5 * 5)
    c2 = 2 * batch * 8 * 8 * 512 * (32 * 5 * 5)
    fc = 2 * batch * 7 * 7 * 512 * 10
    return float(c1 + c2 + fc)


def fc2_512_grad_analytic_flops(batch: int) -> float:
    """fc2-512 on 784 inputs: forward 2*B*(784*512+512*512+512*10) MAC-FLOPs;
    a full backward ~2x the forward's matmul work (dx and dW products)."""
    fwd = 2 * batch * (784 * 512 + 512 * 512 + 512 * 10)
    return float(3 * fwd)


def cost_model_crosscheck():
    from robustbnns_tpu.models.architectures import build_architecture

    out = {}
    rng = np.random.default_rng(0)

    arch = build_architecture("conv", "leaky", (28, 28, 1), 10, 512, "mnist")
    params = arch.init(jax.random.key(0))
    x = jnp.asarray(rng.random((128, 28, 28, 1), dtype=np.float32))
    fwd = jax.jit(arch.apply)
    sync(fwd(params, x))
    xla = _cost_flops(fwd, params, x)

    def fwd_step(c, i):
        # carry feeds the input (1e-30 * c keeps the value bit-identical in
        # practice while making each iteration data-dependent on the last)
        return jnp.sum(arch.apply(params, x + 1e-30 * c)), None

    out["conv512_b128_fwd"] = dict(
        xla_flops=xla, analytic_flops=conv512_analytic_flops(128),
        time_ms=_amortized_ms(fwd_step), amortized_over=AMORT,
    )

    arch2 = build_architecture("fc2", "leaky", (28, 28, 1), 10, 512)
    from robustbnns_tpu.utils.pytree import flatten_tree_to_vector

    flat0, unravel = flatten_tree_to_vector(arch2.init(jax.random.key(0)))
    nb = 256 if QUICK else 5000
    xb = jnp.asarray(rng.random((nb, 28, 28, 1), dtype=np.float32))
    lb = jnp.asarray(rng.integers(0, 10, size=nb), jnp.int32)

    def potential(q):
        logits = arch2.apply(unravel(q), xb)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return 0.5 * jnp.sum(q * q) - jnp.sum(
            jnp.take_along_axis(logp, lb[:, None], axis=-1)
        )

    @jax.jit
    def grad_probe(q):
        with jax.default_matmul_precision("highest"):
            return jax.grad(potential)(q)

    sync(grad_probe(flat0))

    def grad_step(c, i):
        with jax.default_matmul_precision("highest"):
            g = jax.grad(potential)(flat0 + 1e-30 * c)
        return jnp.sum(g), None

    out[f"fc2_512_b{nb}_grad"] = dict(
        xla_flops=_cost_flops(grad_probe, flat0),
        analytic_flops=fc2_512_grad_analytic_flops(nb),
        time_ms=_amortized_ms(grad_step), amortized_over=AMORT,
    )
    RESULTS["cost_model"] = out
    print("cost_model:", json.dumps(out, indent=1), flush=True)


# How many body iterations to fuse into one dispatch when timing a unit.
# Single-dispatch timings on this box measure the ~27.6 ms remote-tunnel
# round trip, not the kernel (the round-5 first run proved it: every
# "component" of the PGD decomposition came back ≈ the dispatch floor).
# Scanning the body AMORT times inside one jit divides the floor out; the
# carry threads through each iteration's input so XLA cannot hoist the body
# out of the loop as loop-invariant.
AMORT = 4 if QUICK else 64


def _amortized_ms(step, K=None) -> float:
    """Median wall ms per iteration of ``step(carry, i) -> carry`` scanned K
    times inside ONE jitted dispatch. ``step`` must consume ``carry`` in its
    compute (not just pass it through), so the loop body stays serial."""
    import jax.lax as lax

    K = AMORT if K is None else K

    @jax.jit
    def run():
        c, _ = lax.scan(step, jnp.float32(0.0), jnp.arange(K))
        return c

    float(run())  # compile + warm
    t = median3(lambda: _t(lambda: float(run())))
    return t / K * 1e3


# --------------------------------------------------------------------------- #
# 2. dispatch floor
# --------------------------------------------------------------------------- #


def dispatch_floor():
    @jax.jit
    def tick(x):
        return x + 1.0

    x = jnp.zeros((8,), jnp.float32)
    sync(tick(x))
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        sync(tick(x))
        ts.append(time.perf_counter() - t0)
    RESULTS["dispatch_floor_ms"] = dict(
        median=float(np.median(ts)) * 1e3, min=float(np.min(ts)) * 1e3,
        p90=float(np.percentile(ts, 90)) * 1e3,
    )
    print("dispatch_floor_ms:", RESULTS["dispatch_floor_ms"], flush=True)


# --------------------------------------------------------------------------- #
# 3. SVI batch sweep
# --------------------------------------------------------------------------- #


def svi_batch_sweep():
    if QUICK:
        # XLA:CPU takes >10 min just to compile the conv-512 scanned epoch on
        # this 1-vCPU box; the section is a thin sweep over bench_jax_svi
        # (exercised on TPU by every bench run), so QUICK skips it.
        print("svi: skipped under --quick", flush=True)
        RESULTS["svi_batch_sweep"] = "skipped (quick)"
        return
    rows = []
    budget = 38400
    for batch in (128, 512, 2048):
        n_steps = max(1, budget // batch)  # constant image budget
        rate = median3(
            lambda: bench_jax_svi(n_steps_timed=n_steps, batch_size=batch)
        )
        rows.append(dict(batch=batch, steps_per_sec=rate,
                         imgs_per_sec=rate * batch))
        print("svi:", rows[-1], flush=True)
    RESULTS["svi_batch_sweep"] = rows


# --------------------------------------------------------------------------- #
# 4. PGD decomposition
# --------------------------------------------------------------------------- #


def pgd_decomposition(batch=2048, S=10):
    if QUICK:
        batch, S = 64, 2
    from robustbnns_tpu.inference.svi import init_meanfield
    from robustbnns_tpu.models.architectures import build_architecture
    from robustbnns_tpu.predict import svi_predict

    arch = build_architecture("fc2", "leaky", (28, 28, 1), 10, 512)
    posterior = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(posterior)
    ) // 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 28, 28, 1), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=batch), jnp.int32)
    base_key = jax.random.key(2)

    def iter_keys(i):
        # fresh draws per scanned iteration — exactly what the real PGD loop
        # does — so XLA cannot hoist the PRNG out of the loop
        return jax.random.split(jax.random.fold_in(base_key, i), S)

    def noise_step(c, i):
        # the S weight draws of one PGD iteration, nothing else
        ks = iter_keys(i)
        leaves = jax.tree_util.tree_leaves(posterior)
        s = jnp.float32(0.0)
        for k in range(S):
            for j, l in enumerate(leaves[: len(leaves) // 2]):
                s += jnp.sum(
                    jax.random.normal(jax.random.fold_in(ks[k], j), l.shape)
                )
        return c + s, None

    def fwd_step(c, i):
        probs = svi_predict(arch, posterior, x + 1e-30 * c, iter_keys(i))
        return jnp.sum(probs), None

    def ce_grad_step(c, i):
        ks = iter_keys(i)

        def loss(x):
            probs = svi_predict(arch, posterior, x, ks)
            logp = jnp.log(jnp.clip(probs, 1e-12, 1.0))
            return -jnp.sum(jnp.take_along_axis(logp, y[:, None], axis=-1))

        return jnp.sum(jax.grad(loss)(x + 1e-30 * c)), None

    out = dict(
        n_params=n_params, S=S, batch=batch, amortized_over=AMORT,
        noise_only_ms=_amortized_ms(noise_step),
        forward_ms=_amortized_ms(fwd_step),
        ce_grad_ms=_amortized_ms(ce_grad_step),
    )
    RESULTS["pgd_decomposition"] = out
    print("pgd_decomposition:", out, flush=True)


def _t(thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


# --------------------------------------------------------------------------- #
# 5. NUTS chunk ablation + HMC on the same batch
# --------------------------------------------------------------------------- #


def nuts_vs_hmc_60k():
    nuts_kw = dict(batch=256, n_draws=2, max_depth=4) if QUICK else dict(n_draws=8)
    rows = []
    # chunk 8 = the whole 8-draw probe in ONE dispatch (isolates dispatch
    # count from chunk shape); the trailing repeat of 5 is an order control —
    # the first r5 run measured chunk-5 2.8x slower than chunk-20, far more
    # than one extra ~27 ms dispatch can explain, so distinguish "chunking
    # really costs" from "first-measurement transient".
    for chunk in ((5, 20) if QUICK else (5, 8, 20, 80, 5)):
        os.environ["ROBUSTBNNS_NUTS_CHUNK"] = str(chunk)
        rate = bench_jax_nuts(**nuts_kw)
        rows.append(dict(chunk=chunk, grad_evals_per_sec=rate))
        print("nuts:", rows[-1], flush=True)
    os.environ.pop("ROBUSTBNNS_NUTS_CHUNK", None)
    # plain HMC leapfrog on the SAME 60k batch (chunked like the bench HMC):
    os.environ.setdefault("ROBUSTBNNS_HMC_CHUNK", "10")
    hmc_kw = dict(batch=256, n_samples=3) if QUICK else dict(batch=60000, n_samples=20)
    hmc_rate = bench_jax_hmc(num_steps=10, **hmc_kw)
    RESULTS["nuts_chunk_ablation"] = rows
    RESULTS["hmc_60k_leapfrog_per_sec"] = hmc_rate
    print("hmc 60k leapfrog/s:", hmc_rate, flush=True)


def scan_trip_count_check():
    """Does XLA's cost model multiply a lax.scan body by its trip count?
    If not, bench's per-step FLOP division over-divides every scanned metric
    (SVI /300, PGD /40) and the published MFU numbers are undercounts."""
    def scanned(n):
        @jax.jit
        def run(x):
            def body(c, _):
                return c @ x, None

            c, _ = jax.lax.scan(body, x, None, length=n)
            return c

        return run

    x = jnp.ones((256, 256), jnp.float32)
    f2 = _cost_flops(scanned(2), x)
    f8 = _cost_flops(scanned(8), x)
    RESULTS["scan_trip_count"] = dict(
        flops_len2=f2, flops_len8=f8,
        multiplies_trip_count=bool(f8 > 3 * f2),
    )
    print("scan_trip_count:", RESULTS["scan_trip_count"], flush=True)


SECTIONS = {
    "cost": cost_model_crosscheck,
    "scan": scan_trip_count_check,
    "dispatch": dispatch_floor,
    "svi": svi_batch_sweep,
    "pgd": pgd_decomposition,
    "nuts": nuts_vs_hmc_60k,
}


# Which RESULTS keys each section fills — used for restart-safe skipping.
SECTION_KEYS = {
    "cost": ("cost_model",),
    "scan": ("scan_trip_count",),
    "dispatch": ("dispatch_floor_ms",),
    "svi": ("svi_batch_sweep",),
    "pgd": ("pgd_decomposition",),
    "nuts": ("nuts_chunk_ablation", "hmc_60k_leapfrog_per_sec"),
}


def main():
    t0 = time.time()
    only = [a.split("=", 1)[1].split(",") for a in sys.argv if a.startswith("--only=")]
    force = [a.split("=", 1)[1].split(",") for a in sys.argv if a.startswith("--force=")]
    names = only[0] if only else list(SECTIONS)
    force = set(force[0]) if force else set()
    out_dir = "tests_out" if QUICK else "data"
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "roofline.json")

    # Restart-safe: a wedged tunnel dispatch can kill the run mid-section
    # (CLAUDE.md); resume from the last checkpointed JSON and re-run only the
    # sections whose keys are missing.
    if os.path.exists(path) and not QUICK:
        try:
            with open(path) as f:
                RESULTS.update(json.load(f))
            print(f"resuming from {path}: {sorted(RESULTS)}", flush=True)
        except Exception as e:
            print(f"checkpoint unreadable ({e}); starting fresh", flush=True)

    def checkpoint():
        RESULTS["peak_flops"] = PEAK_FLOPS
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(RESULTS, f, indent=1)
        os.replace(tmp, path)

    for name in names:
        if name not in force and all(k in RESULTS for k in SECTION_KEYS[name]):
            print(f"{name}: already measured (checkpoint), skipping", flush=True)
            continue
        SECTIONS[name]()
        checkpoint()
    checkpoint()
    print(f"\nROOFLINE total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
