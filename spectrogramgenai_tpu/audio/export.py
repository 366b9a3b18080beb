"""Spectrogram export/import with the reference's filesystem contract.

Reference behavior (helpers.py:95-104, 141): spectrograms are saved as
matplotlib viridis-colormapped PNGs keyed ``{file}_{begin}_{begin}.png`` and
later read back with ``Image.open(...).convert("L")`` — a lossy nonlinear
round-trip baked into the data path (SURVEY.md §7 quirks).

We provide:
  * viridis-PNG compat mode (default for parity with the reference's files),
  * an exact float path (.npy) as the recommended lossless default, and
  * the grayscale read-back used by all training pipelines.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def spec_png_name(file_name: str, begin_time: float) -> str:
    b = int(begin_time)
    return f"{file_name}_{b}_{b}.png"


def _viridis_rgba(img01: np.ndarray) -> np.ndarray:
    import matplotlib.cm as cm

    return (cm.viridis(img01) * 255).astype(np.uint8)


def save_spectrogram_png(spec: np.ndarray, path: str) -> None:
    """matplotlib plt.imsave parity: per-image min/max scaled viridis PNG."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    lo, hi = float(spec.min()), float(spec.max())
    img01 = (spec - lo) / (hi - lo) if hi > lo else np.zeros_like(spec)
    Image.fromarray(_viridis_rgba(img01)).save(path)


def save_generated_png(img_uint8: np.ndarray, path: str) -> None:
    """Generated-sample export (diff_modules.py:771-775): uint8/255 → viridis."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img01 = np.squeeze(img_uint8).astype(np.float32) / 255.0
    Image.fromarray(_viridis_rgba(img01)).save(path)


def save_spectrogram_npy(spec: np.ndarray, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, spec.astype(np.float32))


def load_image_grayscale(path: str) -> np.ndarray:
    """Image.open(...).convert('L') parity → (H, W) float32 in [0, 1].

    Also transparently loads .npy exact-array spectrograms (rescaled to
    [0,1] per image like the PNG path's implicit min/max scaling)."""
    if path.endswith(".npy"):
        spec = np.load(path).astype(np.float32)
        lo, hi = spec.min(), spec.max()
        return (spec - lo) / (hi - lo) if hi > lo else np.zeros_like(spec)
    img = Image.open(path).convert("L")
    return np.asarray(img, dtype=np.float32) / 255.0
