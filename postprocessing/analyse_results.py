"""Cross-run results aggregation (capability rebuild of the reference's R
postprocessing layer, SURVEY.md §2.4 E5: analyse_results.R).

Reads the per-run metric CSVs written by cli/train_classifiers.py, selects
each run's best-validation epoch, and emits:
  * an aggregate CSV (model × synthetic-count → best val/test metrics),
  * accuracy-vs-synthetic-count plots (one line per model),
  * a LaTeX results table.

  python postprocessing/analyse_results.py --results_dir results --out_dir results/analysis
"""

from __future__ import annotations

import argparse
import glob
import os
import re

import numpy as np
import pandas as pd


def collect(results_dir: str) -> pd.DataFrame:
    rows = []
    for path in glob.glob(os.path.join(results_dir, "*", "*_metrics.csv")):
        m = re.match(r"^(\w+?)_synth(\d+)(_kd)?_metrics\.csv$", os.path.basename(path))
        if not m:
            continue
        df = pd.read_csv(path)
        if "val_acc" not in df or df.empty:
            continue
        best = df.loc[df["val_acc"].idxmax()]
        rows.append({
            "model": m.group(1),
            "synth": int(m.group(2)),
            "kd": bool(m.group(3)),
            "best_epoch": int(best["epoch"]),
            "val_acc": float(best["val_acc"]),
            "val_f1": float(best.get("val_f1", np.nan)),
            "test_acc": float(best["test_acc"]) if str(best.get("test_acc", "")) not in ("", "nan") else np.nan,
        })
    return pd.DataFrame(rows).sort_values(["model", "synth"]).reset_index(drop=True)


def plot_acc_vs_synth(agg: pd.DataFrame, out_path: str, metric: str = "val_acc"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for model, group in agg.groupby("model"):
        g = group.sort_values("synth")
        ax.plot(g["synth"], g[metric], marker="o", label=model)
    ax.set_xlabel("synthetic images per class")
    ax.set_ylabel(metric)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def latex_table(agg: pd.DataFrame) -> str:
    pivot = agg.pivot_table(index="model", columns="synth", values="val_acc")
    lines = ["\\begin{tabular}{l" + "r" * len(pivot.columns) + "}", "\\toprule",
             "model & " + " & ".join(str(c) for c in pivot.columns) + " \\\\", "\\midrule"]
    for model, row in pivot.iterrows():
        cells = " & ".join("-" if np.isnan(v) else f"{v:.3f}" for v in row)
        lines.append(f"{model} & {cells} \\\\")
    lines += ["\\bottomrule", "\\end{tabular}"]
    return "\n".join(lines)


def split_distribution_table(dfs: dict, out_path: str):
    """Per-class split-count LaTeX table with proportional color bars
    (reference paper_plots.R capability)."""
    import pandas as pd

    counts = pd.DataFrame({name: df["common_name"].value_counts() for name, df in dfs.items()}).fillna(0)
    counts = counts.astype(int).sort_index()
    total = counts.sum(axis=1)
    lines = ["\\begin{tabular}{l" + "r" * (len(counts.columns) + 1) + "}", "\\toprule",
             "class & " + " & ".join(counts.columns) + " & total \\\\", "\\midrule"]
    for cname, row in counts.iterrows():
        cells = " & ".join(
            f"\\databar{{{v / max(1, total[cname]):.2f}}}{{{v}}}" for v in row
        )
        lines.append(f"{cname} & {cells} & {total[cname]} \\\\")
    lines += ["\\bottomrule", "\\end{tabular}"]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))


def recording_effort_heatmap(df, out_path: str, time_col: str = "recording_time"):
    """Recording-effort heatmap: recordings per (month × hour)
    (reference data_time_plot.R capability). Expects a datetime column."""
    import matplotlib
    import pandas as pd

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    times = pd.to_datetime(df[time_col])
    grid = pd.crosstab(times.dt.month, times.dt.hour)
    fig, ax = plt.subplots(figsize=(10, 5))
    im = ax.imshow(grid, aspect="auto", cmap="viridis", origin="lower")
    ax.set_xlabel("hour of day")
    ax.set_ylabel("month")
    ax.set_yticks(range(len(grid.index)))
    ax.set_yticklabels(grid.index)
    fig.colorbar(im, label="recordings")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results_dir", default="results")
    p.add_argument("--out_dir", default="results/analysis")
    a = p.parse_args(argv)

    agg = collect(a.results_dir)
    os.makedirs(a.out_dir, exist_ok=True)
    agg.to_csv(os.path.join(a.out_dir, "aggregate_results.csv"), index=False)
    if not agg.empty:
        plot_acc_vs_synth(agg, os.path.join(a.out_dir, "acc_vs_synth.png"))
        with open(os.path.join(a.out_dir, "results_table.tex"), "w") as f:
            f.write(latex_table(agg))
    print(f"aggregated {len(agg)} runs → {a.out_dir}")


if __name__ == "__main__":
    main()
