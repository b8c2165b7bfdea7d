"""Three-way matmul-precision study: default / high / highest (VERDICT r3 #3).

Round 3 fixed the TPU MCMC adaptation collapse by defaulting the samplers to
``precision="highest"`` (full f32), at a measured 3.2x HMC throughput cost.
The untried middle ground is ``"high"`` (bf16_3x passes — ~f32 accuracy at a
fraction of the cost). This script runs the ready-made instrumented collapse
repro (PERFORMANCE.md round-3 table: fc2-32 half-moons, 5k inputs, full-batch
chain, warmup 100) at all three precisions, for BOTH engines, and measures
throughput at the bench's fc2-512 5000-image HMC config — producing the
stability + steps/s table that decides the default.

Stability signature of the collapse (round 3): adapted eps ~ 3e-8, inverse
mass pinned at the Welford regularization floor (~9.09e-05 for a 5k-draw
window), accept ~ 1.0, posterior spread ~ 0.0.

Run (TPU, ~10-20 min): ``python -u scripts/precision_study.py > precstudy.log 2>&1``
Output: table on stdout + ``data/precision_study.json``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ROBUSTBNNS_DATA_FALLBACK", "synthetic")
os.environ.setdefault("ROBUSTBNNS_HMC_CHUNK", "100")
os.environ.setdefault("ROBUSTBNNS_NUTS_CHUNK", "10")

import jax

QUICK = "--quick" in sys.argv
if QUICK:  # tiny CPU shakeout of the plumbing (not a measurement)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

from robustbnns_tpu.data import load_dataset
from robustbnns_tpu.inference.hmc import HMCConfig, hmc_sample
from robustbnns_tpu.inference.nuts import NUTSConfig, nuts_sample
from robustbnns_tpu.models.architectures import build_architecture
from robustbnns_tpu.utils.pytree import flatten_tree_to_vector

PRECISIONS = ["default", "high", "highest"]

CKPT_PATH = os.path.join("tests_out" if QUICK else "data", "precision_study.json")
STATE = {"stability": [], "throughput": [], "seed_sweep": []}


def load_ckpt():
    """Resume support: a wedged tunnel dispatch can kill the run mid-row
    (CLAUDE.md); the queue's retry then re-measures only what's missing."""
    if QUICK or not os.path.exists(CKPT_PATH):
        return
    try:
        with open(CKPT_PATH) as f:
            saved = json.load(f)
        STATE["stability"] = saved.get("stability", [])
        STATE["throughput"] = saved.get("throughput", [])
        STATE["seed_sweep"] = saved.get("seed_sweep", [])
        done = [(r["engine"], r["precision"], r.get("seed"))
                for part in STATE.values() for r in part]
        print(f"resuming from {CKPT_PATH}: {done}", flush=True)
    except Exception as e:
        print(f"checkpoint unreadable ({e}); starting fresh", flush=True)


def checkpoint():
    os.makedirs(os.path.dirname(CKPT_PATH), exist_ok=True)
    tmp = CKPT_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(STATE, f, indent=1)
    os.replace(tmp, CKPT_PATH)


def have(part: str, engine: str, precision: str) -> bool:
    return any(
        r["engine"] == engine and r["precision"] == precision
        for r in STATE[part]
    )


def sync(x) -> float:
    return float(jnp.sum(x))


def make_potential(arch, unravel):
    def potential(q, x, labels):
        logits = arch.apply(unravel(q), x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.sum(jnp.take_along_axis(logp, labels[:, None], axis=-1))
        return 0.5 * jnp.sum(q * q) - ll

    return potential


def diagnostics(samples, info):
    """The round-3 collapse-signature fields."""
    s = np.asarray(samples)
    inv_mass = np.asarray(info.inv_mass)
    acc = getattr(info, "accept_prob", None)
    if acc is None:
        acc = info.accept_stat
    out = dict(
        eps=float(np.asarray(info.step_size)),
        inv_mass_min=float(inv_mass.min()),
        inv_mass_med=float(np.median(inv_mass)),
        inv_mass_max=float(inv_mass.max()),
        accept=float(np.mean(np.asarray(acc))),
        spread=float(s.std(axis=0).mean()),
    )
    nlf = getattr(info, "num_leapfrog", None)
    if nlf is not None:
        out["leapfrog_per_draw"] = float(np.mean(np.asarray(nlf)))
    return out


def stability_repro():
    """fc2-32 half-moons, 5k inputs, full-batch chain, warmup 100 — the
    instrumented round-3 repro, per engine x precision."""
    n_inputs, n_samp, warm = (300, 10, 10) if QUICK else (5000, 250, 100)
    x_train, y_train, _, _, inp_shape, out_size = load_dataset(
        "half_moons", n_inputs=n_inputs, shuffle=False
    )
    arch = build_architecture("fc2", "leaky", inp_shape, out_size, 32)
    flat0, unravel = flatten_tree_to_vector(arch.init(jax.random.key(0)))
    potential = make_potential(arch, unravel)
    x = jnp.asarray(x_train)
    labels = jnp.argmax(jnp.asarray(y_train), axis=-1)

    for precision in PRECISIONS:
        if not have("stability", "hmc", precision):
            cfg = HMCConfig(
                num_samples=n_samp, warmup=warm, step_size=0.001, num_steps=10,
                precision=precision,
            )
            t0 = time.perf_counter()
            samples, info = hmc_sample(
                potential, flat0, jax.random.key(1), cfg, data=(x, labels)
            )
            sync(samples)
            row = dict(engine="hmc", precision=precision,
                       wall_s=round(time.perf_counter() - t0, 1),
                       **diagnostics(samples, info))
            STATE["stability"].append(row)
            checkpoint()
            print(row, flush=True)

        if not have("stability", "nuts", precision):
            ncfg = NUTSConfig(
                num_samples=n_samp, warmup=warm, step_size=0.001,
                max_depth=6 if QUICK else 10, precision=precision,
            )
            t0 = time.perf_counter()
            samples, info = nuts_sample(
                potential, flat0, jax.random.key(1), ncfg, data=(x, labels)
            )
            sync(samples)
            row = dict(engine="nuts", precision=precision,
                       wall_s=round(time.perf_counter() - t0, 1),
                       **diagnostics(samples, info))
            STATE["stability"].append(row)
            checkpoint()
            print(row, flush=True)
    return STATE["stability"]


def throughput():
    """bench.py's HMC leapfrog config (fc2-512, full 5000-image batch),
    medians of 3 per precision."""
    from bench import bench_jax_hmc

    kw = dict(batch=64, n_samples=3) if QUICK else {}
    for precision in PRECISIONS:
        if have("throughput", "hmc-bench", precision):
            continue
        vals = [bench_jax_hmc(precision=precision, **kw) for _ in range(3)]
        row = dict(engine="hmc-bench", precision=precision,
                   steps_per_sec=float(np.median(vals)),
                   runs=[round(v, 1) for v in vals])
        STATE["throughput"].append(row)
        checkpoint()
        print(row, flush=True)
    return STATE["throughput"]


def seed_sweep():
    """Settle the HMC high-vs-highest call: the single-seed stability rows
    show a 1.6x posterior-spread gap (0.071 vs 0.112) that is either bf16_3x
    noise or just a different (healthy) adaptation path. Re-run the HMC repro
    at both precisions over fresh seeds — if the per-seed spreads interleave,
    the gap is adaptation-path noise and "high" is a safe default."""
    n_inputs, n_samp, warm = (300, 10, 10) if QUICK else (5000, 250, 100)
    x_train, y_train, _, _, inp_shape, out_size = load_dataset(
        "half_moons", n_inputs=n_inputs, shuffle=False
    )
    arch = build_architecture("fc2", "leaky", inp_shape, out_size, 32)
    flat0, unravel = flatten_tree_to_vector(arch.init(jax.random.key(0)))
    potential = make_potential(arch, unravel)
    x = jnp.asarray(x_train)
    labels = jnp.argmax(jnp.asarray(y_train), axis=-1)

    seeds = [2, 3] if QUICK else [2, 3, 4, 5]
    for seed in seeds:
        for precision in ("high", "highest"):
            if any(r["precision"] == precision and r.get("seed") == seed
                   for r in STATE["seed_sweep"]):
                continue
            cfg = HMCConfig(
                num_samples=n_samp, warmup=warm, step_size=0.001, num_steps=10,
                precision=precision,
            )
            t0 = time.perf_counter()
            samples, info = hmc_sample(
                potential, flat0, jax.random.key(seed), cfg, data=(x, labels)
            )
            sync(samples)
            row = dict(engine="hmc", precision=precision, seed=seed,
                       wall_s=round(time.perf_counter() - t0, 1),
                       **diagnostics(samples, info))
            STATE["seed_sweep"].append(row)
            checkpoint()
            print(row, flush=True)
    return STATE["seed_sweep"]


def main():
    t0 = time.time()
    load_ckpt()
    if "--seeds" in sys.argv:
        rows = seed_sweep()
        print("\n| seed | precision | eps | accept | spread |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['seed']} | {r['precision']} | {r['eps']:.2e} | "
                  f"{r['accept']:.3f} | {r['spread']:.4f} |")
        print(f"\nSEED SWEEP total {time.time() - t0:.0f}s", flush=True)
        return
    out = dict(stability=stability_repro(), throughput=throughput())
    checkpoint()
    print(f"\nPRECISION STUDY total {time.time() - t0:.0f}s", flush=True)

    print("\n| engine | precision | eps | inv_mass[min,med,max] | accept | spread | wall_s |")
    print("|---|---|---|---|---|---|---|")
    for r in out["stability"]:
        print(
            f"| {r['engine']} | {r['precision']} | {r['eps']:.2e} | "
            f"{r['inv_mass_min']:.2e}, {r['inv_mass_med']:.2f}, "
            f"{r['inv_mass_max']:.2f} | {r['accept']:.3f} | "
            f"{r['spread']:.4f} | {r['wall_s']} |"
        )
    print("\n| precision | HMC leapfrog steps/s (median of 3) |")
    print("|---|---|")
    for r in out["throughput"]:
        print(f"| {r['precision']} | {r['steps_per_sec']:.0f} |")


if __name__ == "__main__":
    main()
