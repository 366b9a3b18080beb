"""Native C++ batch PNG decoder vs the PIL reference path.

The decoder must be BIT-identical to PIL's Image.open(...).convert('L')
(the reference data path, reference helpers.py:141) across every PNG color
type the pipeline can meet: gray, RGB, RGBA, gray+alpha, palette — including
matplotlib's actual viridis output files.
"""

import numpy as np
import pytest
from PIL import Image

from spectrogramgenai_tpu.data.native_png import load_png_batch_gray, native_available
from spectrogramgenai_tpu.data.pipeline import ImageFolderSource, decode_gray_batch

pytestmark = pytest.mark.skipif(not native_available(), reason="native toolchain unavailable")


def _write_pngs(tmp_path):
    rng = np.random.default_rng(0)
    h = w = 64
    paths = []

    def put(name, img: Image.Image):
        p = str(tmp_path / name)
        img.save(p)
        paths.append(p)

    put("gray.png", Image.fromarray(rng.integers(0, 256, (h, w), dtype=np.uint8), "L"))
    put("rgb.png", Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "RGB"))
    put("rgba.png", Image.fromarray(rng.integers(0, 256, (h, w, 4), dtype=np.uint8), "RGBA"))
    put("graya.png", Image.fromarray(rng.integers(0, 256, (h, w, 2), dtype=np.uint8), "LA"))
    pal = Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "RGB").convert(
        "P", palette=Image.ADAPTIVE
    )
    put("palette.png", pal)

    # a real viridis spectrogram PNG, the exact artifact of the data path
    from spectrogramgenai_tpu.audio.export import save_spectrogram_png

    spec = rng.standard_normal((h, w)).astype(np.float32)
    p = str(tmp_path / "viridis.png")
    save_spectrogram_png(spec, p)
    paths.append(p)
    return paths, h, w


def test_native_matches_pil_bitexact(tmp_path):
    paths, h, w = _write_pngs(tmp_path)
    got, ok = load_png_batch_gray(paths, h, w, num_threads=2)
    assert ok.all(), f"native decode failed for {[p for p, o in zip(paths, ok) if not o]}"
    for p, g in zip(paths, got):
        ref = np.asarray(Image.open(p).convert("L"))
        assert np.array_equal(g, ref), f"mismatch for {p}"


def test_wrong_dims_and_missing_fall_back(tmp_path):
    paths, h, w = _write_pngs(tmp_path)
    got, ok = load_png_batch_gray([paths[0], str(tmp_path / "nope.png")], h + 8, w, 1)
    assert not ok.any()
    assert (got == 0).all()
    # decode_gray_batch recovers the wrong-dims row through the PIL fallback
    out = decode_gray_batch([paths[0]], h + 8, w)
    assert out.shape == (1, h + 8, w) and out.max() > 0


def test_image_folder_batch_path_matches_per_sample(tmp_path):
    rng = np.random.default_rng(1)
    for ci, cname in enumerate(["a", "b"]):
        d = tmp_path / "ds" / cname
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 256, (32, 32, 4), dtype=np.uint8), "RGBA").save(
                str(d / f"{i}.png")
            )
    src = ImageFolderSource(str(tmp_path / "ds"))
    chunk = np.arange(6)
    batched = src.load_batch(chunk)
    singles = [src.load(int(i)) for i in chunk]
    assert np.array_equal(batched["label"], np.asarray([s["label"] for s in singles]))
    np.testing.assert_array_equal(
        batched["image"], np.stack([s["image"] for s in singles])
    )
