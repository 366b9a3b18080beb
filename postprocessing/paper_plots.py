"""Split-distribution paper artifacts (capability rebuild of the reference's
postprocessing/paper_plots.R).

From the specdata manifest (train/val dataframes + categories) and the
neal-labels test CSV it emits:
  * a LaTeX table with per-split proportional color bars — the R script's
    ``\\color{seabornX}{\\rule{Xcm}{6pt} pct}`` cells (paper_plots.R:69-75),
    same bar scales (6 cm for train/val, 2.5 cm for test), xtable-style
    wrapper;
  * a per-class split-proportion dodge bar chart (paper_plots.R:31-37).

  python postprocessing/paper_plots.py --manifest specdata.npz \\
      [--neal_csv neal_labels.csv --wav_dir wavs/] --out_dir results/paper
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (LaTeX color name, bar scale in cm) per split — paper_plots.R:69-75
SPLIT_STYLE = {
    "train": ("seabornBlue", 6.0),
    "val": ("seabornOrange", 6.0),
    "test": ("seabornGreen", 2.5),
}


def split_counts(dfs: dict[str, pd.DataFrame], classes: list[str],
                 class_col: str = "common_name") -> pd.DataFrame:
    """Per-class counts for each split, indexed by class name (zeros kept —
    paper_plots.R:66 `df[is.na(df)] <- 0L`)."""
    out = pd.DataFrame(index=sorted(classes))
    for name, df in dfs.items():
        out[f"{name}_counts"] = df[class_col].value_counts().reindex(out.index).fillna(0).astype(int)
    return out


def colorbar_latex_table(counts: pd.DataFrame) -> str:
    """The R script's xtable output: one color-bar cell per split, bar width
    proportional to the class's share of that split, label = percentage."""
    splits = [c[: -len("_counts")] for c in counts.columns if c.endswith("_counts")]
    bar_cols = {}
    for split in splits:
        color, scale = SPLIT_STYLE.get(split, ("seabornBlue", 6.0))
        col = counts[f"{split}_counts"]
        total = max(1, int(col.sum()))
        bar_cols[split] = [
            f"\\color{{{color}}}{{\\rule{{{round(scale * v / total, 3)}cm}}{{6pt}} "
            f"{round(100.0 * v / total, 1)}}}"
            for v in col
        ]

    header = (["common name"] + [f"{s} counts" for s in splits] + list(splits))
    lines = [
        "\\begin{table}[ht]", "\\centering",
        "\\begin{tabular}{r" + "r" * len(splits) + "l" * len(splits) + "}",
        "  \\hline",
        " & ".join(header) + " \\\\",
        "  \\hline",
    ]
    for i, (cname, row) in enumerate(counts.iterrows()):
        cells = [str(cname)] + [str(int(row[f"{s}_counts"])) for s in splits]
        cells += [bar_cols[s][i] for s in splits]
        lines.append("  " + " & ".join(cells) + " \\\\")
    lines += ["  \\hline", "\\end{tabular}", "\\end{table}"]
    return "\n".join(lines)


def split_proportion_plot(dfs: dict[str, pd.DataFrame], classes: list[str], out_path: str,
                          class_col: str = "common_name"):
    """Dodge bar chart of each class's within-class split proportion
    (paper_plots.R:31-37 ggplot histogram, position='dodge')."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    counts = split_counts(dfs, classes, class_col)
    count_cols = [c for c in counts.columns if c.endswith("_counts")]
    total = counts[count_cols].sum(axis=1).clip(lower=1)

    x = np.arange(len(counts))
    width = 0.8 / len(count_cols)
    fig, ax = plt.subplots(figsize=(max(8, len(counts) * 0.45), 5))
    for i, col in enumerate(count_cols):
        ax.bar(x + (i - (len(count_cols) - 1) / 2) * width, counts[col] / total,
               width, label=col[: -len("_counts")])
    ax.set_xticks(x)
    ax.set_xticklabels(counts.index, rotation=60, ha="right")
    ax.set_ylabel("proportion")
    ax.legend(title="split")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def main(argv=None):
    from spectrogramgenai_tpu.data.manifest import load_specdata_manifest, neal_test_filter

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True, help="specdata.npz (train_df/test_df/categories)")
    p.add_argument("--neal_csv", default=None, help="neal labels CSV for the test split")
    p.add_argument("--wav_dir", default=None, help="wav dir the neal filter checks existence in")
    p.add_argument("--out_dir", default="results/paper")
    a = p.parse_args(argv)

    train_df, val_df, classes = load_specdata_manifest(a.manifest)
    dfs = {"train": train_df, "val": val_df}
    if a.neal_csv:
        test_df = pd.read_csv(a.neal_csv)
        test_df["common_name"] = test_df["class_label"]
        if a.wav_dir:
            test_df = neal_test_filter(test_df, list(classes), a.wav_dir)
        dfs["test"] = test_df

    os.makedirs(a.out_dir, exist_ok=True)
    counts = split_counts(dfs, list(classes))
    counts.to_csv(os.path.join(a.out_dir, "split_counts.csv"))
    with open(os.path.join(a.out_dir, "split_distribution.tex"), "w") as f:
        f.write(colorbar_latex_table(counts))
    split_proportion_plot(dfs, list(classes), os.path.join(a.out_dir, "split_proportions.png"))
    print(f"paper plots → {a.out_dir}")


if __name__ == "__main__":
    main()
