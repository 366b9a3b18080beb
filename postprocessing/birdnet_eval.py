"""BirdNET vs human-label comparison (capability rebuild of the reference's
postprocessing/neal_test_eval.R, SURVEY.md §2.4 E4/E5).

Consumes a BirdNET-Analyzer prediction CSV (file_name, begin_time, predicted
common_name + confidence columns, or a wide per-class score table) and the
human-labeled test manifest, reports top-prediction accuracy — both raw and
masked to the project's class subset — and writes a per-class bar-chart.

  python postprocessing/birdnet_eval.py --predictions birdnet_preds.csv \
      --labels neal_labels.csv --classes_from datasets/train
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd


def evaluate(preds: pd.DataFrame, labels: pd.DataFrame, classes: list[str]):
    """→ dict with raw accuracy and accuracy masked to `classes`."""
    merged = labels.merge(preds, on=["file_name", "begin_time"], suffixes=("", "_pred"))
    if merged.empty:
        raise ValueError("no (file_name, begin_time) overlap between labels and predictions")

    truth = merged["common_name"]
    raw_pred = merged["predicted_common_name"]
    raw_acc = float((raw_pred == truth).mean())

    # masked: restrict BirdNET's candidates to the project classes by taking
    # the highest-scoring in-subset prediction when per-class scores exist,
    # else dropping out-of-subset predictions.
    score_cols = [c for c in merged.columns if c.startswith("score_")]
    if score_cols:
        subset_cols = [f"score_{c}" for c in classes if f"score_{c}" in merged.columns]
        masked_pred = merged[subset_cols].to_numpy().argmax(axis=1)
        masked_pred = pd.Series([subset_cols[i][len("score_"):] for i in masked_pred],
                                index=merged.index)
    else:
        masked_pred = raw_pred.where(raw_pred.isin(classes))
    masked_acc = float((masked_pred == truth).mean())

    per_class = (
        pd.DataFrame({"truth": truth, "correct": (raw_pred == truth)})
        .groupby("truth")["correct"].mean()
    )
    return {"accuracy": raw_acc, "masked_accuracy": masked_acc, "per_class": per_class,
            "n": len(merged)}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--predictions", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--classes_from", required=True, help="folder whose subdirs are the classes")
    p.add_argument("--out_dir", default="results/birdnet_eval")
    a = p.parse_args(argv)

    from spectrogramgenai_tpu.data.manifest import class_names_from_folder

    classes = class_names_from_folder(a.classes_from)
    preds = pd.read_csv(a.predictions)
    labels = pd.read_csv(a.labels)
    res = evaluate(preds, labels, classes)

    os.makedirs(a.out_dir, exist_ok=True)
    res["per_class"].to_csv(os.path.join(a.out_dir, "per_class_accuracy.csv"))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    res["per_class"].plot.bar(ax=ax)
    ax.set_ylabel("top-prediction accuracy")
    ax.axhline(res["accuracy"], color="k", ls="--", lw=1, label=f"overall {res['accuracy']:.3f}")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(a.out_dir, "birdnet_accuracy.png"), dpi=150)

    print(f"BirdNET accuracy: {res['accuracy']:.4f}  masked-to-{len(classes)}-classes: "
          f"{res['masked_accuracy']:.4f}  (n={res['n']})")


if __name__ == "__main__":
    main()
