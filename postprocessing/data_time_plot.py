"""Recording-effort plots (capability rebuild of the reference's
postprocessing/data_time_plot.R).

From the detections CSV (the reference's model_output_loc_merge.csv schema:
``datetime`` ISO strings, ``recorder`` site ids, ``confidence``) it emits:
  * a confidence histogram (data_time_plot.R:9-15 — 30 bins on [0, 1]);
  * per-recorder recording-effort heatmaps: detections per (date × hour)
    tile, viridis colormap, hour axis reversed with 00:00 at the top,
    shared color scale across recorders (data_time_plot.R:46-81) — one PNG
    per recorder (the facet_grid equivalent).

  python postprocessing/data_time_plot.py --csv model_output_loc_merge.csv \\
      --out_dir results/effort
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

# data_time_plot.R:26-33 site display names
RECORDER_NAMES = {
    "CARNSOREMET": "Carnsore",
    "CLOOSHVALLEY": "Cloosh",
    "RAHORA": "Rahora",
    "RICHFIELDM1": "Richfield",
    "TEEVURCHER": "Teevurcher",
}


def confidence_histogram(df: pd.DataFrame, out_path: str, bins: int = 30):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    ax.hist(df["confidence"].astype(float), bins=bins, range=(0.0, 1.0),
            color="skyblue", edgecolor="grey")
    ax.set_xlabel("Confidence")
    ax.set_ylabel("Count")
    ax.set_xlim(0, 1)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def effort_counts(df: pd.DataFrame, datetime_col: str = "datetime",
                  recorder_col: str = "recorder") -> pd.DataFrame:
    """(recorder, date, hour) → count, with display-name mapping applied."""
    times = pd.to_datetime(df[datetime_col], format="ISO8601")
    out = pd.DataFrame({
        "recorder": df[recorder_col].map(lambda r: RECORDER_NAMES.get(r, r)),
        "date": times.dt.date,
        "hour": times.dt.hour,
    })
    return out.groupby(["recorder", "date", "hour"]).size().reset_index(name="count")


def recording_effort_heatmaps(df: pd.DataFrame, out_dir: str,
                              datetime_col: str = "datetime",
                              recorder_col: str = "recorder") -> list[str]:
    """One date×hour viridis heatmap per recorder; hour axis reversed
    (00:00 on top), color scale shared across recorders. Returns paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    counts = effort_counts(df, datetime_col, recorder_col)
    vmax = max(1, int(counts["count"].max()))
    paths = []
    for recorder, group in counts.groupby("recorder"):
        dates = sorted(group["date"].unique())
        date_idx = {d: i for i, d in enumerate(dates)}
        grid = np.zeros((24, len(dates)))
        for _, row in group.iterrows():
            grid[int(row["hour"]), date_idx[row["date"]]] = row["count"]

        fig, ax = plt.subplots(figsize=(max(6, len(dates) * 0.25), 6))
        im = ax.imshow(grid, aspect="auto", cmap="viridis", vmin=0, vmax=vmax,
                       origin="upper")  # hour 0 at the top (R reversed axis)
        ax.set_yticks(range(0, 24, 2))
        ax.set_yticklabels([f"{h:02d}:00" for h in range(0, 24, 2)])
        stride = max(1, len(dates) // 12)
        ax.set_xticks(range(0, len(dates), stride))
        ax.set_xticklabels([pd.Timestamp(d).strftime("%d %b %Y")
                            for d in dates[::stride]], rotation=45, ha="right")
        ax.set_title(recorder)
        fig.colorbar(im, label="Count")
        fig.tight_layout()
        path = os.path.join(out_dir, f"effort_{recorder}.png")
        fig.savefig(path, dpi=150)
        plt.close(fig)
        paths.append(path)
    return paths


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv", required=True, help="detections CSV (datetime/recorder/confidence)")
    p.add_argument("--out_dir", default="results/effort")
    a = p.parse_args(argv)

    df = pd.read_csv(a.csv)
    os.makedirs(a.out_dir, exist_ok=True)
    confidence_histogram(df, os.path.join(a.out_dir, "confidence_hist.png"))
    paths = recording_effort_heatmaps(df, a.out_dir)
    print(f"effort plots ({len(paths)} recorders) → {a.out_dir}")


if __name__ == "__main__":
    main()
