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


def _viridis_lut() -> np.ndarray:
    """256×3 uint8 viridis LUT; index = clip(int(x·256), 0, 255) is bit-exact
    vs matplotlib Colormap.__call__'s quantization (verified in tests)."""
    import matplotlib.cm as cm

    return (cm.viridis(np.arange(256) / 255.0) * 255).astype(np.uint8)[:, :3]


def save_spectrogram_pngs(specs: np.ndarray, paths: list[str],
                          num_threads: int = 8) -> None:
    """Batch viridis-PNG export — the bulk gen_specs path.

    PIL's single-threaded zlib-6 encode (~10-25 ms/image) is the wall of the
    reference's bulk export (helpers.py:103, ~384k files for the paper's
    640 h corpus), not the mel math. This path does the per-image min/max +
    viridis LUT vectorized over the whole batch, then hands the RGB planes
    to the native C++ thread-pool encoder (native/png_batch.cpp, Sub filter);
    per-file PIL is the fallback. Pixel-identical to save_spectrogram_png.
    """
    specs = np.asarray(specs)
    n = specs.shape[0]
    if n == 0:
        return
    for p in paths:
        d = os.path.dirname(p)
        if d:
            os.makedirs(d, exist_ok=True)
    lo = specs.min(axis=(1, 2), keepdims=True)
    hi = specs.max(axis=(1, 2), keepdims=True)
    rng = np.where(hi > lo, hi - lo, 1.0)
    img01 = np.where(hi > lo, (specs - lo) / rng, 0.0)
    idx = np.clip((img01 * 256.0).astype(np.int32), 0, 255)
    rgb = np.ascontiguousarray(_viridis_lut()[idx])  # [n, H, W, 3] uint8

    from spectrogramgenai_tpu.data.native_png import save_png_batch_rgb

    ok = save_png_batch_rgb(rgb, paths, num_threads=num_threads)
    rest = [i for i in range(n) if not ok[i]]
    if rest:
        import concurrent.futures as cf

        def _one(i):
            Image.fromarray(rgb[i]).save(paths[i])

        if len(rest) > 1 and num_threads > 1:
            with cf.ThreadPoolExecutor(max_workers=num_threads) as pool:
                list(pool.map(_one, rest))
        else:
            for i in rest:
                _one(i)


def save_generated_png(img_uint8: np.ndarray, path: str) -> None:
    """Generated-sample export (diff_modules.py:771-775): uint8/255 → viridis."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img01 = np.squeeze(img_uint8).astype(np.float32) / 255.0
    Image.fromarray(_viridis_rgba(img01)).save(path)


def save_generated_pngs(imgs_uint8: np.ndarray, paths: list[str],
                        num_threads: int = 8) -> None:
    """Batch variant of save_generated_png for the generate CLI's per-chain
    write-out (27+ images at once): viridis LUT + native C++ thread-pool
    encoder instead of per-image PIL (~5× on 1-core hosts, more with cores).
    Pixel-equivalent RGB output (viridis alpha ≡ 255); PIL fallback per image.
    """
    imgs = np.asarray(imgs_uint8)
    if imgs.ndim == 4 and imgs.shape[-1] == 1:
        imgs = imgs[..., 0]
    n = imgs.shape[0]
    if n == 0:
        return
    for p in paths:
        d = os.path.dirname(p)
        if d:
            os.makedirs(d, exist_ok=True)
    # LUT index = the uint8 value exactly: clip(int(v/255·256)) == v (see
    # _viridis_lut docstring) — bit-matches save_generated_png's colormap
    # (cm.viridis clips out-of-range inputs, so clip the index likewise).
    rgb = np.ascontiguousarray(_viridis_lut()[np.clip(imgs.astype(np.int32), 0, 255)])

    from spectrogramgenai_tpu.data.native_png import save_png_batch_rgb

    ok = save_png_batch_rgb(rgb, paths, num_threads=num_threads)
    for i in range(n):
        if not ok[i]:
            Image.fromarray(rgb[i]).save(paths[i])


def save_spectrogram_npy(spec: np.ndarray, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, spec.astype(np.float32))


def load_generated_spec_uint8(path: str) -> np.ndarray:
    """Exact inverse of save_generated_png's colormap: viridis RGB → the
    original uint8 values.

    ``convert("L")`` luminance is NOT that inverse — measured, it warps
    values by up to 41/255 (≈13 dB at top_db=80) and non-monotonically
    (that lossy read-back is the *training* contract, kept separately in
    :func:`load_image_grayscale`). A nearest-LUT-entry lookup recovers
    every pixel up to viridis' own uint8 quantization collisions (a few
    adjacent indices share an RGB triple → ±1 level = 0.31 dB, the PNG
    format's floor), and degrades gracefully for recompressed images."""
    rgb = np.asarray(Image.open(path).convert("RGB"), dtype=np.int32)
    lut = _viridis_lut().astype(np.int32)  # (256, 3)
    out = np.empty(rgb.shape[:2], np.uint8)
    for lo in range(0, rgb.shape[0], 32):  # row blocks bound the temp to ~8 MB
        block = rgb[lo : lo + 32]
        d = ((block[..., None, :] - lut[None, None, :, :]) ** 2).sum(-1)
        out[lo : lo + 32] = d.argmin(-1).astype(np.uint8)
    return out


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
