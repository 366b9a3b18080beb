"""Postprocessing layer tests: results aggregation, LaTeX table, BirdNET eval."""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "postprocessing"))


def test_collect_and_latex(tmp_path):
    from analyse_results import collect, latex_table, plot_acc_vs_synth

    for model, synth, accs in (("custom", 0, [0.3, 0.5, 0.4]), ("custom", 50, [0.4, 0.6, 0.55]),
                               ("resnet", 0, [0.2, 0.45, 0.5])):
        d = tmp_path / f"{model}_synth{synth}"
        d.mkdir()
        pd.DataFrame({
            "epoch": range(len(accs)),
            "val_acc": accs,
            "val_f1": [a - 0.05 for a in accs],
            "test_acc": [a - 0.1 for a in accs],
        }).to_csv(d / f"{model}_synth{synth}_metrics.csv", index=False)

    agg = collect(str(tmp_path))
    assert len(agg) == 3
    best = agg[(agg.model == "custom") & (agg.synth == 50)].iloc[0]
    assert best["val_acc"] == 0.6 and best["best_epoch"] == 1

    tex = latex_table(agg)
    assert "custom" in tex and "0.600" in tex and "\\begin{tabular}" in tex

    out = tmp_path / "plot.png"
    plot_acc_vs_synth(agg, str(out))
    assert out.exists()


def test_birdnet_eval(tmp_path):
    from birdnet_eval import evaluate

    labels = pd.DataFrame({
        "file_name": ["a.wav", "b.wav", "c.wav", "d.wav"],
        "begin_time": [0, 0, 0, 0],
        "common_name": ["robin", "wren", "robin", "owl"],
    })
    preds = pd.DataFrame({
        "file_name": ["a.wav", "b.wav", "c.wav", "d.wav"],
        "begin_time": [0, 0, 0, 0],
        "predicted_common_name": ["robin", "sparrow", "robin", "owl"],
    })
    res = evaluate(preds, labels, classes=["owl", "robin", "wren"])
    assert res["n"] == 4
    assert abs(res["accuracy"] - 0.75) < 1e-9
    # masked: 'sparrow' is out-of-subset → dropped → still wrong for b.wav
    assert abs(res["masked_accuracy"] - 0.75) < 1e-9
    assert res["per_class"]["robin"] == 1.0 and res["per_class"]["wren"] == 0.0


def test_split_distribution_and_heatmap(tmp_path):
    from analyse_results import recording_effort_heatmap, split_distribution_table

    rng = np.random.default_rng(0)
    dfs = {
        "train": pd.DataFrame({"common_name": ["a"] * 5 + ["b"] * 3}),
        "val": pd.DataFrame({"common_name": ["a"] * 2 + ["b"] * 2}),
    }
    tex_path = tmp_path / "split.tex"
    split_distribution_table(dfs, str(tex_path))
    tex = tex_path.read_text()
    assert "train" in tex and "a &" in tex

    df = pd.DataFrame({"recording_time": pd.to_datetime(
        rng.integers(1577836800, 1609459200, 50), unit="s")})
    hm = tmp_path / "hm.png"
    recording_effort_heatmap(df, str(hm))
    assert hm.exists()
