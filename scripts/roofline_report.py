"""Render data/roofline.json (scripts/roofline.py output) as markdown tables.

Produces the measurement tables behind the PERFORMANCE.md roofline section
(VERDICT r3 #4): cost-model cross-check with achieved TFLOP/s and MFU,
dispatch floor, SVI batch sweep, PGD per-iteration decomposition, and the
NUTS chunk ablation vs same-batch HMC. Interpretation lives in
PERFORMANCE.md; this script only derives the numbers.

Run (CPU, instant): ``python scripts/roofline_report.py [json_path]``
"""
import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "data/roofline.json"
    with open(path) as f:
        R = json.load(f)
    peak = R.get("peak_flops", 197e12)

    cm = R.get("cost_model", {})
    if cm:
        print("### Cost-model cross-check\n")
        print("| op | XLA cost-model FLOPs | analytic FLOPs | ratio | time | achieved TFLOP/s (analytic) | MFU |")
        print("|---|---|---|---|---|---|---|")
        amort = None
        for name, row in cm.items():
            xla, ana, ms = row["xla_flops"], row["analytic_flops"], row["time_ms"]
            amort = row.get("amortized_over", amort)
            tf = ana / (ms * 1e-3) / 1e12
            print(
                f"| {name} | {xla:.3g} | {ana:.3g} | {xla / ana:.2f} | "
                f"{ms:.2f} ms | {tf:.1f} | {100 * tf * 1e12 / peak:.1f}% |"
            )
        if amort:
            print(
                f"\n(times amortized over {amort} scanned iterations per "
                "dispatch — single-dispatch timings only measure the tunnel "
                "floor)"
            )
        print()

    st = R.get("scan_trip_count")
    if st:
        print(
            f"scan trip count in the cost model: len-2 scan {st['flops_len2']:.3g} "
            f"FLOPs vs len-8 {st['flops_len8']:.3g} -> multiplies trip count: "
            f"**{st['multiplies_trip_count']}**\n"
        )

    df = R.get("dispatch_floor_ms")
    if df:
        print(
            f"Dispatch floor (trivial jitted op, host-transfer sync): median "
            f"**{df['median']:.2f} ms**, min {df['min']:.2f} ms, p90 {df['p90']:.2f} ms\n"
        )

    sweep = R.get("svi_batch_sweep")
    if isinstance(sweep, list) and sweep:
        base_row = min(sweep, key=lambda r: r["batch"])
        base = base_row["imgs_per_sec"]
        print("### SVI batch sweep (constant image budget)\n")
        print(f"| batch | ELBO steps/s | images/s | vs batch-{base_row['batch']} images/s |")
        print("|---|---|---|---|")
        for row in sweep:
            rel = f"{row['imgs_per_sec'] / base:.2f}x" if base else "n/a"
            print(
                f"| {row['batch']} | {row['steps_per_sec']:.0f} | "
                f"{row['imgs_per_sec']:.0f} | {rel} |"
            )
        print()

    pgd = R.get("pgd_decomposition")
    if pgd:
        tot = pgd["noise_only_ms"] + pgd["forward_ms"] + pgd["ce_grad_ms"]
        amort_note = (
            f", amortized over {pgd['amortized_over']} iterations/dispatch"
            if pgd.get("amortized_over") else ""
        )
        print(
            f"### PGD per-iteration decomposition (fc2-512, S={pgd['S']}, "
            f"batch {pgd['batch']}, {pgd['n_params']:,} params{amort_note})\n"
        )
        print("| unit | time | share of (noise + fwd + grad) |")
        print("|---|---|---|")
        for key, label in [
            ("noise_only_ms", "S weight draws (PRNG only)"),
            ("forward_ms", "S-sample predictive forward"),
            ("ce_grad_ms", "CE input-gradient (fwd+bwd)"),
        ]:
            print(f"| {label} | {pgd[key]:.2f} ms | {100 * pgd[key] / tot:.0f}% |")
        print()

    nuts = R.get("nuts_chunk_ablation")
    if nuts:
        print("### NUTS dispatch-chunk ablation (fc2-512, 60k full batch)\n")
        print("| chunk (draws/dispatch) | gradient evals/s |")
        print("|---|---|")
        for row in nuts:
            print(f"| {row['chunk']} | {row['grad_evals_per_sec']:.1f} |")
        hmc = R.get("hmc_60k_leapfrog_per_sec")
        if hmc is not None:
            print(f"\nPlain-HMC leapfrog/s on the SAME 60k batch: **{hmc:.1f}**")
        print()


if __name__ == "__main__":
    main()
