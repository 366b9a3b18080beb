"""Dataset manifests: specdata.npz / CSV split loading and folder scans.

Parity with the reference's filesystem-as-contract data layer
(SURVEY.md §1): `specdata.npz` carries train/test dataframes + the sorted
27 class names (train_acgan.py:24,52-55); image folders are
class-subdirectory trees (torchvision ImageFolder convention,
diff_utils.py:114-118); generated images follow the
``{class}_gen_imgs_{i}_{samp}.png`` key (diff_modules.py:775).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def load_specdata_manifest(path: str, columns: list[str] | None = None):
    """Load the reference's specdata.npz → (train_df, test_df, class_names)."""
    data = np.load(path, allow_pickle=True)
    cats = [str(c) for c in data["categories"]]
    if columns is None and "columns" in data:
        columns = [str(c) for c in data["columns"]]
    if columns is None:
        # train_acgan.py:52 derives columns from the label CSV; fall back to
        # positional columns when that CSV is absent.
        n_cols = data["train_df"].shape[1]
        columns = [f"col{i}" for i in range(n_cols)]
    train_df = pd.DataFrame(data["train_df"], columns=columns)
    test_df = pd.DataFrame(data["test_df"], columns=columns)
    return train_df, test_df, cats


def class_names_from_folder(root: str) -> list[str]:
    """Sorted subdirectory names (ImageFolder / ddpm_conditional_generate.py:103)."""
    return sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))


def scan_image_folder(root: str) -> tuple[list[str], list[int], list[str]]:
    """ImageFolder scan: (paths, integer labels, class names)."""
    classes = class_names_from_folder(root)
    paths, labels = [], []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(root, cname)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".npy")):
                paths.append(os.path.join(cdir, fname))
                labels.append(ci)
    return paths, labels, classes


def bootstrap_balance_indices(labels: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Class-balanced bootstrap: every class resampled WITH replacement up to
    the max class size (BootstrappedImageFolder, diff_utils.py:80-111)."""
    labels = np.asarray(labels)
    classes, counts = np.unique(labels, return_counts=True)
    max_size = counts.max()
    out = []
    for c in classes:
        idx = np.nonzero(labels == c)[0]
        out.extend(rng.choice(idx, size=max_size, replace=True))
    return np.asarray(out)


def neal_test_filter(df: pd.DataFrame, classes: list[str], image_dir: str,
                     labelers=("dk", "hh", "iw", "ms"), min_confidence: float = 0.9) -> pd.DataFrame:
    """The reference's Neal test-set filter (helpers.py:383-405): trusted
    labelers, confidence ≥ 0.9, dedup by (file, begin_time), class subset,
    and the exported PNG must exist on disk."""
    df = df.copy()
    df["common_name"] = df["class_label"]
    df["begin_time"] = df["start_time"].astype(int)
    df = df[df["confidence"] >= min_confidence]
    df = df[df["labeler"].isin(labelers)]
    df = df[df["common_name"].isin(classes)]
    df = df.drop_duplicates(subset=["file_name", "begin_time"], keep="first")
    df["formatted_file"] = [
        f"{fn}_{int(bt)}_{int(bt)}.png" for fn, bt in zip(df["file_name"], df["begin_time"])
    ]
    available = set(os.listdir(image_dir)) if os.path.isdir(image_dir) else set()
    df = df[df["formatted_file"].isin(available)]
    return df
