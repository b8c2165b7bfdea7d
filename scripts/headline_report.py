"""Render a bench log's JSON line as the PERFORMANCE.md headline tables.

Makes the headline refresh mechanical (VERDICT r4 #4: "no number in the doc
that ``python bench.py`` cannot reproduce"): every cell in the doc's headline
and opt-in tables is derived from the one JSON line bench.py prints, so the
doc can be regenerated from any captured bench log.

Run (CPU, instant): ``python scripts/headline_report.py [bench_log]``
"""
import json
import sys


def _fmt_rate(v: float) -> str:
    if v >= 10000:
        return f"{v:,.0f}".replace(",", " ")  # thin space, doc style
    return f"{v:.0f}"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_r05.log"
    with open(path) as f:
        lines = [l for l in f if l.startswith('{"metric"')]
    if not lines:
        sys.exit(f"no JSON line in {path}")
    d = json.loads(lines[-1])
    e = d["extras"]
    peak_tf = e["mfu_peak_flops"] / 1e12

    def ratio(r: float) -> str:
        return f"**{r:,.0f}×**".replace(",", " ")

    def mfu(key: str) -> str:
        return f"{100 * e[key]:.1f}%"

    svi = d["value"]
    rows = [
        ("SVI ELBO steps/sec — MNIST model_0 (conv-512, batch 128)",
         f"**{_fmt_rate(svi)}/s**", mfu("svi_mfu"),
         f"{svi / d['vs_baseline']:.2f}/s", ratio(d["vs_baseline"])),
        ("— faithful epoch (10-sample train-acc forward per batch)",
         f"**{_fmt_rate(e['svi_faithful_steps_per_sec'])}/s**", "—",
         f"{e['svi_faithful_steps_per_sec'] / e['svi_faithful_vs_torch_cpu']:.3f}/s",
         ratio(e["svi_faithful_vs_torch_cpu"])),
        ("HMC leapfrog steps/sec — fc2-512, full 5000-image batch",
         f"**{_fmt_rate(e['hmc_leapfrog_steps_per_sec'])}/s**", mfu("hmc_mfu"),
         f"{e['hmc_leapfrog_steps_per_sec'] / e['hmc_vs_torch_cpu']:.2f}/s",
         ratio(e["hmc_vs_torch_cpu"])),
        ("Bayesian PGD images/sec — 40 iters × 10 draws/iter, fc2-512, batch 2048",
         f"**{_fmt_rate(e['bayesian_pgd_images_per_sec'])}/s**", mfu("pgd_mfu"),
         f"{e['bayesian_pgd_images_per_sec'] / e['pgd_vs_torch_cpu']:.3f}/s",
         ratio(e["pgd_vs_torch_cpu"])),
        ("— S=100 attack draws (the north-star attack), batch 2048",
         f"**{_fmt_rate(e['bayesian_pgd100_images_per_sec'])}/s**", mfu("pgd100_mfu"),
         f"{e['bayesian_pgd100_images_per_sec'] / e['pgd100_vs_torch_cpu']:.4f}/s",
         ratio(e["pgd100_vs_torch_cpu"])),
        ("NUTS gradient evals/sec — fc2-512, 60k full batch",
         f"**{_fmt_rate(e['nuts_gradient_evals_per_sec'])}/s**", mfu("nuts_mfu"),
         f"{e['nuts_gradient_evals_per_sec'] / e['nuts_vs_torch_cpu']:.3f}/s",
         ratio(e["nuts_vs_torch_cpu"])),
    ]
    print("| Metric | TPU v5e | MFU† | torch-CPU baseline* | ratio |")
    print("|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(r) + " |")
    print()
    print(f"(†achieved FLOP/s / {peak_tf:.0f} TFLOP/s bf16 peak; achieved TFLOP/s: "
          f"SVI {e['svi_achieved_tflops']:.1f}, HMC {e['hmc_achieved_tflops']:.1f}, "
          f"PGD {e['pgd_achieved_tflops']:.1f}/{e['pgd100_achieved_tflops']:.1f}, "
          f"NUTS {e['nuts_achieved_tflops']:.1f}; torch medians of "
          f"{e['torch_baselines_median_of']}"
          + (", cached " + e["torch_baselines_computed_at"]
             if e.get("torch_baselines_cached") else "") + ")")
    print()
    print("| opt-in | TPU v5e | vs default |")
    print("|---|---|---|")
    print(f"| HMC with single-pass-bf16 (`default`-precision) matmuls — collapses "
          f"NUTS adaptation, degrades HMC acceptance (precision study) | "
          f"{_fmt_rate(e['optin_fast_matmul_hmc_steps_per_sec'])}/s | "
          f"{e['optin_fast_matmul_hmc_steps_per_sec'] / e['hmc_leapfrog_steps_per_sec']:.1f}× |")
    print(f"| PGD with bf16 matmuls (`ROBUSTBNNS_BF16=1`) | "
          f"{_fmt_rate(e['optin_bf16_pgd_images_per_sec'])}/s | "
          f"{e['optin_bf16_pgd_images_per_sec'] / e['bayesian_pgd_images_per_sec']:.2f}× |")
    print(f"| fast PRNG (`rbg`): SVI / PGD | "
          f"{_fmt_rate(e['optin_fast_prng_svi_steps_per_sec'])}/s / "
          f"{_fmt_rate(e['optin_fast_prng_pgd_images_per_sec'])}/s | "
          f"{e['optin_fast_prng_svi_steps_per_sec'] / svi:.2f}× / "
          f"{e['optin_fast_prng_pgd_images_per_sec'] / e['bayesian_pgd_images_per_sec']:.2f}× |")
    print(f"| bf16 train-acc predictive in the faithful epoch | "
          f"{_fmt_rate(e['optin_bf16_trainacc_faithful_steps_per_sec'])}/s | "
          f"{e['optin_bf16_trainacc_faithful_steps_per_sec'] / e['svi_faithful_steps_per_sec']:.2f}× |")


if __name__ == "__main__":
    main()
