"""Tests for the science-loop experiment tooling (tools/make_experiment_dataset.py).

The committed experiment (docs/EXPERIMENT.md) depends on two properties of
the corpus generator: determinism (same seed → same wavs, so the committed
run_experiment.sh is reproducible) and SNR-override isolation (regenerating
val/test at a harder SNR must keep the *calls* identical and change only the
noise scale — the controlled change the hard-eval pass relies on).
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import make_experiment_dataset as med  # noqa: E402


def read_wav(path):
    from scipy.io import wavfile

    _sr, data = wavfile.read(path)
    return data


def test_make_is_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    for out in (a, b):
        med.make(str(out), classes=2, per_split={"train": 2}, sr=8000, seed=7)
    for f in sorted(os.listdir(a / "wavs")):
        assert np.array_equal(read_wav(a / "wavs" / f), read_wav(b / "wavs" / f)), f
    df = pd.read_csv(a / "manifest_train.csv")
    assert list(df.columns) == ["file_name", "begin_time", "end_time", "common_name"]
    assert len(df) == 4 and set(df.common_name) == {"species00", "species01"}


def test_snr_override_changes_only_noise_scale(tmp_path):
    """Same seed, lower SNR: the correlation with the original clip stays high
    (same call + same noise realization, rescaled) but the noise floor rises."""
    a, b = tmp_path / "a", tmp_path / "b"
    med.make(str(a), classes=1, per_split={"val": 1}, sr=8000, seed=3)
    med.make(str(b), classes=1, per_split={"val": 1}, sr=8000, seed=3,
             snr_override={"val": (-12.0, -12.0)})
    wa = read_wav(a / "wavs" / "species00_val_000.wav").astype(np.float64)
    wb = read_wav(b / "wavs" / "species00_val_000.wav").astype(np.float64)
    corr = np.corrcoef(wa, wb)[0, 1]
    # unrelated clips correlate ~0; the shared call + shared (rescaled) noise
    # realization keeps these well-correlated even though −12 dB is
    # noise-dominated after peak normalization
    assert corr > 0.3, corr
    assert not np.array_equal(wa, wb)  # but the mix is different


def test_only_filter_skips_splits(tmp_path):
    med.make(str(tmp_path), classes=1, per_split={"train": 1, "val": 1},
             sr=8000, seed=0, only=["val"])
    assert os.path.exists(tmp_path / "manifest_val.csv")
    assert not os.path.exists(tmp_path / "manifest_train.csv")
    assert all("_val_" in f for f in os.listdir(tmp_path / "wavs"))


def test_arrange_builds_imagefolder_tree(tmp_path):
    from PIL import Image

    med.make(str(tmp_path), classes=2, per_split={"train": 1}, sr=8000, seed=0)
    png_dir = tmp_path / "pngs"
    png_dir.mkdir()
    df = pd.read_csv(tmp_path / "manifest_train.csv")
    for fn in df.file_name:
        Image.new("L", (8, 8)).save(png_dir / f"{fn}_0_0.png")
    med.arrange(str(tmp_path), str(png_dir), str(tmp_path / "datasets"))
    for cname in ("species00", "species01"):
        files = os.listdir(tmp_path / "datasets" / "train" / cname)
        assert len(files) == 1 and files[0].endswith(".png")
