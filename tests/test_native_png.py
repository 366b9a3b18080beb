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


def test_native_png_encoder_matches_pil_path(tmp_path):
    """Batch viridis export: native-encoded PNGs decode (via PIL) to exactly
    the same pixels as the per-image PIL path, and the LUT quantization is
    bit-exact vs matplotlib."""
    import matplotlib.cm as cm
    from PIL import Image

    from spectrogramgenai_tpu.audio.export import (
        save_spectrogram_png,
        save_spectrogram_pngs,
    )

    rng = np.random.default_rng(0)
    specs = (rng.standard_normal((4, 48, 64)) * 40.0 - 40.0).astype(np.float32)
    specs[3, :, :] = 7.0  # constant image → zeros branch

    batch_paths = [str(tmp_path / f"batch_{i}.png") for i in range(4)]
    save_spectrogram_pngs(specs, batch_paths)
    for i in range(4):
        ref_path = str(tmp_path / f"ref_{i}.png")
        save_spectrogram_png(specs[i], ref_path)
        got = np.asarray(Image.open(batch_paths[i]).convert("RGB"))
        want = np.asarray(Image.open(ref_path).convert("RGB"))
        np.testing.assert_array_equal(got, want)

    # LUT quantization == matplotlib Colormap.__call__ quantization
    x = rng.random((16, 16)).astype(np.float32)
    x[0, 0], x[0, 1] = 0.0, 1.0
    want = (cm.viridis(x) * 255).astype(np.uint8)[..., :3]
    lut = (cm.viridis(np.arange(256) / 255.0) * 255).astype(np.uint8)[:, :3]
    got = lut[np.clip((x * 256.0).astype(np.int32), 0, 255)]
    np.testing.assert_array_equal(got, want)


def test_native_png_encoder_roundtrips_through_native_decoder(tmp_path):
    # encode with the native encoder, decode with the native decoder:
    # grayscale read-back must equal PIL's convert("L") of the same file
    from PIL import Image

    from spectrogramgenai_tpu.data.native_png import (
        load_png_batch_gray,
        native_available,
        save_png_batch_rgb,
    )

    if not native_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (3, 32, 40, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"r{i}.png") for i in range(3)]
    ok = save_png_batch_rgb(rgb, paths)
    if not ok.any():
        import pytest

        pytest.skip("native encoder unavailable (stale prebuilt library)")
    assert ok.all()
    gray, gok = load_png_batch_gray(paths, 32, 40)
    assert gok.all()
    for i in range(3):
        pil = np.asarray(Image.open(paths[i]).convert("L"))
        np.testing.assert_array_equal(gray[i], pil)


def test_in_memory_batch_encode_matches_file_encoder_and_pil(tmp_path):
    # serving hot path: png_batch_encode_rgb's in-memory bytes must decode
    # (via PIL) to the exact input pixels, for several image sizes
    import io

    import pytest
    from PIL import Image

    from spectrogramgenai_tpu.data.native_png import encode_png_batch_rgb, native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(2)
    for h, w in ((32, 40), (256, 256)):
        rgb = rng.integers(0, 256, (4, h, w, 3), dtype=np.uint8)
        encoded = encode_png_batch_rgb(rgb, num_threads=2)
        if encoded is None:
            pytest.skip("in-memory encoder unavailable (stale prebuilt library)")
        assert len(encoded) == 4
        for i, blob in enumerate(encoded):
            back = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
            np.testing.assert_array_equal(back, rgb[i])


def test_serving_batch_png_matches_per_image_path():
    # _png_bytes_batch (native RGB) and _png_bytes (PIL RGBA) must agree on
    # the viridis RGB pixels and on the grayscale training read-back
    import io

    from PIL import Image

    from spectrogramgenai_tpu.serving.server import _png_bytes, _png_bytes_batch

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (3, 32, 40, 1), dtype=np.uint8)
    batch = _png_bytes_batch(imgs)
    assert len(batch) == 3
    for i, blob in enumerate(batch):
        got = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
        ref = np.asarray(Image.open(io.BytesIO(_png_bytes(imgs[i]))).convert("RGB"))
        np.testing.assert_array_equal(got, ref)


def test_save_generated_pngs_matches_single_image_path(tmp_path):
    # generate CLI's batch write-out must match save_generated_png pixel-for-
    # pixel on both the RGB planes and the grayscale training read-back
    from PIL import Image

    from spectrogramgenai_tpu.audio.export import save_generated_png, save_generated_pngs

    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (3, 32, 40, 1), dtype=np.uint8)
    batch_paths = [str(tmp_path / f"b{i}.png") for i in range(3)]
    save_generated_pngs(imgs, batch_paths)
    for i in range(3):
        ref_path = str(tmp_path / f"s{i}.png")
        save_generated_png(imgs[i], ref_path)
        got = np.asarray(Image.open(batch_paths[i]).convert("RGB"))
        ref = np.asarray(Image.open(ref_path).convert("RGB"))
        np.testing.assert_array_equal(got, ref)
        got_l = np.asarray(Image.open(batch_paths[i]).convert("L"))
        ref_l = np.asarray(Image.open(ref_path).convert("L"))
        np.testing.assert_array_equal(got_l, ref_l)
