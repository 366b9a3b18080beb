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


def test_paper_plots_from_synthetic_manifest(tmp_path):
    """paper_plots.py end-to-end from a synthetic specdata.npz manifest:
    color-bar LaTeX (R paper_plots.R cell format), counts CSV, dodge plot."""
    import subprocess

    rng = np.random.default_rng(1)
    classes = np.asarray(["robin", "wren", "owl"], dtype=object)
    cols = ["file_name", "begin_time", "common_name"]

    def make_rows(n):
        return np.asarray(
            [[f"f{i}.wav", float(i), classes[rng.integers(0, 3)]] for i in range(n)],
            dtype=object,
        )

    manifest = tmp_path / "specdata.npz"
    np.savez(manifest, train_df=make_rows(40), test_df=make_rows(12),
             categories=classes, columns=np.asarray(cols, dtype=object))

    out_dir = tmp_path / "paper"
    repo = os.path.join(os.path.dirname(__file__), "..")
    subprocess.run(
        [sys.executable, os.path.join(repo, "postprocessing", "paper_plots.py"),
         "--manifest", str(manifest), "--out_dir", str(out_dir)],
        check=True, cwd=repo, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    tex = (out_dir / "split_distribution.tex").read_text()
    assert "\\rule{" in tex and "seabornBlue" in tex and "robin" in tex
    assert (out_dir / "split_counts.csv").exists()
    assert (out_dir / "split_proportions.png").exists()


def test_data_time_plot_from_synthetic_csv(tmp_path):
    """data_time_plot.py: confidence histogram + per-recorder date×hour
    heatmaps from a synthetic detections CSV (R data_time_plot.R schema)."""
    from data_time_plot import confidence_histogram, effort_counts, recording_effort_heatmaps

    rng = np.random.default_rng(2)
    times = pd.to_datetime(rng.integers(1688169600, 1690848000, 200), unit="s")
    df = pd.DataFrame({
        "datetime": times.strftime("%Y-%m-%dT%H:%M:%S"),
        "recorder": rng.choice(["RICHFIELDM1", "CARNSOREMET"], size=200),
        "confidence": rng.uniform(0, 1, 200),
    })

    confidence_histogram(df, str(tmp_path / "conf.png"))
    assert (tmp_path / "conf.png").exists()

    counts = effort_counts(df)
    assert set(counts["recorder"]) == {"Richfield", "Carnsore"}  # renamed
    assert counts["count"].sum() == 200

    paths = recording_effort_heatmaps(df, str(tmp_path))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
