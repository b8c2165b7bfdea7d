"""Overparametrization report: grid3_summary.csv -> markdown tables + trend.

Answers the round-2/3 open question — does the paper's "expected loss
gradients shrink in the overparametrized limit" claim
(reference ``plot_halfMoons_overparam.py:34-144``) emerge once the posterior
is properly mixed? — from the tri-variant 36-cell grid produced by
``scripts/grid3.py``:

* ``faithful`` — the reference's batched resample-with-replacement HMC
  (Pyro 1.3.0 semantics, ~30 distinct draws out of 250);
* ``full``     — one proper full-data HMC chain per cell;
* ``nuts``     — full-data NUTS chain per cell (best-mixed posterior).

Emits (stdout, markdown): per-variant width tables (mean |E[grad]| per
component, posterior spread, distinct draws), a per-width shrinkage ratio
table, and Spearman-style monotonicity stats of |gx| vs hidden size within
each (warmup, n_inputs) cell family — the quantitative basis for the
PERFORMANCE.md conclusion paragraph.

Run (CPU, instant): ``python scripts/overparam_report.py [csv_path]``
"""
import sys

import numpy as np
import pandas as pd

WIDTHS = [32, 128, 256, 512]


def monotonicity(sub: pd.DataFrame, col: str) -> tuple[int, int, int]:
    """Across (warmup, n_inputs) families: count strictly-decreasing,
    strictly-increasing, and total width-wise sequences of ``col``."""
    dec = inc = tot = 0
    for (_, _), fam in sub.groupby(["warmup", "n_inputs"]):
        fam = fam.set_index("hidden_size")[col]
        seq = [fam[w] for w in WIDTHS if w in fam.index]
        if len(seq) < len(WIDTHS):
            continue
        tot += 1
        if all(a > b for a, b in zip(seq, seq[1:])):
            dec += 1
        if all(a < b for a, b in zip(seq, seq[1:])):
            inc += 1
    return dec, inc, tot


def main():
    csv = sys.argv[1] if len(sys.argv) > 1 else "data/grid3_summary.csv"
    df = pd.read_csv(csv)
    print(f"rows: {len(df)} ({dict(df['variant'].value_counts())})\n")

    for variant in ("faithful", "full", "nuts"):
        sub = df[df["variant"] == variant]
        if not len(sub):
            continue
        g = sub.groupby("hidden_size").agg(
            cells=("grad_absmean_x", "size"),
            gx=("grad_absmean_x", "mean"),
            gy=("grad_absmean_y", "mean"),
            spread=("sample_spread", "mean"),
            distinct=("distinct_draws", "mean"),
            acc=("test_acc", "mean"),
        )
        print(f"### {variant}\n")
        print("| hidden | cells | mean |E[g_x]| | mean |E[g_y]| | posterior"
              " spread | distinct/250 | acc % |")
        print("|---|---|---|---|---|---|---|")
        for h, r in g.iterrows():
            print(f"| {h} | {int(r.cells)} | {r.gx:.4f} | {r.gy:.4f} | "
                  f"{r.spread:.4f} | {r.distinct:.0f} | {r.acc:.1f} |")
        if 32 in g.index and 512 in g.index:
            print(f"\n512-vs-32 gradient ratio: x {g.gx[512] / g.gx[32]:.2f}, "
                  f"y {g.gy[512] / g.gy[32]:.2f}")
        dec, inc, tot = monotonicity(sub, "grad_absmean_x")
        print(f"width-monotone families (|E[g_x]|): {dec}/{tot} strictly "
              f"decreasing, {inc}/{tot} strictly increasing\n")

    # cross-variant: gradient magnitude vs mixing quality at each width
    print("### gradient magnitude vs posterior mixing (mean over cells)\n")
    print("| hidden | faithful |E[g_x]| (spread) | full |E[g_x]| (spread) |"
          " nuts |E[g_x]| (spread) |")
    print("|---|---|---|---|")
    piv = df.pivot_table(index="hidden_size", columns="variant",
                         values=["grad_absmean_x", "sample_spread"],
                         aggfunc="mean")
    for h in WIDTHS:
        if h not in piv.index:
            continue
        cells = []
        for v in ("faithful", "full", "nuts"):
            try:
                gx = piv.loc[h, ("grad_absmean_x", v)]
                sp = piv.loc[h, ("sample_spread", v)]
                cells.append("—" if pd.isna(gx) else f"{gx:.4f} ({sp:.3f})")
            except KeyError:
                cells.append("—")
        print(f"| {h} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
