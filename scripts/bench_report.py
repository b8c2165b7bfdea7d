"""Render a bench.py JSON line as the PERFORMANCE.md headline tables.

Accepts any of: a driver capture (``BENCH_rNN.json`` with a ``parsed`` field),
a bench log whose last line is the JSON (``bench_r05.log``), or a file that is
the bare JSON line. Keeps the doc refresh mechanical — every number in the
headline section comes from this renderer, so "no number bench.py cannot
reproduce" (VERDICT r4 #4) holds by construction.

Run (CPU, instant): ``python scripts/bench_report.py <path>``
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "parsed" in doc:
            if doc["parsed"] is None:
                raise SystemExit(f"{path}: driver capture has parsed=null")
            return doc["parsed"]
        if isinstance(doc, dict) and "metric" in doc:
            return doc
    except json.JSONDecodeError:
        pass
    # log file: last parseable JSON line wins
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                doc = json.loads(line)
                if "metric" in doc:
                    return doc
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"{path}: no bench JSON line found")


def fmt_rate(v: float) -> str:
    return f"{v:,.0f}/s".replace(",", " ") if v >= 100 else f"{v:.1f}/s"


def fmt_ratio(r) -> str:
    if r is None:
        return "n/a"
    return f"**{r:,.0f}×**".replace(",", " ")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r05.json"
    d = load(path)
    e = d["extras"]

    def base(jax_rate, ratio_key):
        r = e.get(ratio_key)
        if ratio_key == "vs_baseline":
            r = d["vs_baseline"]
        return "n/a" if not r else f"{jax_rate / r:.4g}/s"

    rows = [
        ("SVI ELBO steps/sec — MNIST model_0 (conv-512, batch 128)",
         d["value"], e.get("svi_mfu"), d["vs_baseline"]),
        ("— faithful epoch (10-sample train-acc forward per batch)",
         e["svi_faithful_steps_per_sec"], None, e["svi_faithful_vs_torch_cpu"]),
        ("HMC leapfrog steps/sec — fc2-512, full 5000-image batch, f32",
         e["hmc_leapfrog_steps_per_sec"], e.get("hmc_mfu"), e["hmc_vs_torch_cpu"]),
        ("Bayesian PGD images/sec — 40 iters × 10 draws/iter, fc2-512, batch 2048",
         e["bayesian_pgd_images_per_sec"], e.get("pgd_mfu"), e["pgd_vs_torch_cpu"]),
        ("— S=100 attack draws (the north-star attack), batch 2048",
         e["bayesian_pgd100_images_per_sec"], e.get("pgd100_mfu"),
         e["pgd100_vs_torch_cpu"]),
        ("NUTS gradient evals/sec — fc2-512, 60k full batch",
         e["nuts_gradient_evals_per_sec"], e.get("nuts_mfu"),
         e["nuts_vs_torch_cpu"]),
    ]
    print("| Metric | TPU v5e | MFU† | torch-CPU baseline* | ratio |")
    print("|---|---|---|---|---|")
    for label, rate, mfu_val, r in rows:
        mfu_s = f"{100 * mfu_val:.1f}%" if mfu_val is not None else "—"
        base_s = "n/a" if not r else f"{rate / r:.3g}/s"
        print(f"| {label} | **{fmt_rate(rate)}** | {mfu_s} | {base_s} | {fmt_ratio(r)} |")
    print()

    hmc_def = e["hmc_leapfrog_steps_per_sec"]
    pgd_def = e["bayesian_pgd_images_per_sec"]
    svi_def = d["value"]
    faith_def = e["svi_faithful_steps_per_sec"]
    print("| opt-in | TPU v5e | vs default |")
    print("|---|---|---|")
    print(
        f"| HMC with default-precision (bf16-pass) matmuls — collapses "
        f"adaptation on sharp posteriors, see round-3 section | "
        f"{fmt_rate(e['optin_fast_matmul_hmc_steps_per_sec'])} | "
        f"{e['optin_fast_matmul_hmc_steps_per_sec'] / hmc_def:.1f}× |"
    )
    print(
        f"| PGD with bf16 matmuls (`ROBUSTBNNS_BF16=1`) | "
        f"{fmt_rate(e['optin_bf16_pgd_images_per_sec'])} | "
        f"{e['optin_bf16_pgd_images_per_sec'] / pgd_def:.2f}× |"
    )
    print(
        f"| fast PRNG (`rbg`): SVI / PGD | "
        f"{fmt_rate(e['optin_fast_prng_svi_steps_per_sec'])} / "
        f"{fmt_rate(e['optin_fast_prng_pgd_images_per_sec'])} | "
        f"{e['optin_fast_prng_svi_steps_per_sec'] / svi_def:.2f}× / "
        f"{e['optin_fast_prng_pgd_images_per_sec'] / pgd_def:.2f}× |"
    )
    print(
        f"| bf16 train-acc predictive in the faithful epoch | "
        f"{fmt_rate(e['optin_bf16_trainacc_faithful_steps_per_sec'])} | "
        f"{e['optin_bf16_trainacc_faithful_steps_per_sec'] / faith_def:.2f}× |"
    )
    print()
    print("Achieved TFLOP/s: "
          f"SVI {e.get('svi_achieved_tflops')}, HMC {e.get('hmc_achieved_tflops')}, "
          f"PGD {e.get('pgd_achieved_tflops')}, PGD100 {e.get('pgd100_achieved_tflops')}, "
          f"NUTS {e.get('nuts_achieved_tflops')}  "
          f"(peak {e.get('mfu_peak_flops', 197e12) / 1e12:.0f} TFLOP/s)")
    if "torch_baselines_cached" in e:
        print(f"torch baselines cached: {e['torch_baselines_cached']} "
              f"(computed {e.get('torch_baselines_computed_at')})")


if __name__ == "__main__":
    main()
