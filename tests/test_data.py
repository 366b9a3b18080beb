"""Data layer tests: transforms parity, wav slicing, export round-trip,
bootstrap balancing, folder pipeline, synthetic mixing."""

import os

import numpy as np
import jax.numpy as jnp

from spectrogramgenai_tpu.audio.export import (
    load_image_grayscale,
    save_generated_png,
    save_spectrogram_npy,
    save_spectrogram_png,
    spec_png_name,
)
from spectrogramgenai_tpu.audio.mix import midpoint_normalize, mix_waveforms
from spectrogramgenai_tpu.audio.wavio import fixed_window, load_wav, normalize_peak, slice_clip
from spectrogramgenai_tpu.data.manifest import bootstrap_balance_indices
from spectrogramgenai_tpu.data.pipeline import ImageFolderSource, iterate_batches, synthetic_mix_dataframe
from spectrogramgenai_tpu.data.transforms import renorm_m1_1


def test_renorm_matches_reference_unit_test():
    # the reference's own test cases (tests/test_main.py)
    out = np.asarray(renorm_m1_1(jnp.asarray([[0.0, 0.5, 1.0]])))
    np.testing.assert_allclose(out, [[-1.0, 0.0, 1.0]], atol=1e-6)
    out = np.asarray(renorm_m1_1(jnp.asarray([[0.0, 127.5, 255.0]])))
    np.testing.assert_allclose(out, [[-1.0, 0.0, 1.0]], atol=1e-6)
    out = np.asarray(renorm_m1_1(jnp.asarray([[-30.0, 10.0, 20.0]])))
    np.testing.assert_allclose(out, [[-1.0, 0.6, 1.0]], atol=1e-6)
    out = renorm_m1_1(jnp.asarray([[5.0]]))
    assert out.shape == (1, 1)


def test_wav_roundtrip_and_slicing(tmp_path):
    from scipy.io import wavfile

    sr = 8000
    t = np.arange(sr * 10) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))

    loaded, got_sr = load_wav(path)
    assert got_sr == sr
    np.testing.assert_allclose(loaded, wav, atol=1e-3)

    clip = slice_clip(loaded, sr, begin_time=2, end_time=9, clip_seconds=6)
    assert len(clip) == 6 * sr
    np.testing.assert_allclose(clip, loaded[2 * sr : 8 * sr])

    # window overruns the end → fall back to [end-6, end]
    clip = slice_clip(loaded, sr, begin_time=7, end_time=9, clip_seconds=6)
    np.testing.assert_allclose(clip, loaded[3 * sr : 9 * sr])

    w = fixed_window(loaded, sr, 0.0, 2**13)
    assert len(w) == 2**13
    assert abs(np.abs(w).max() - 1.0) < 1e-6  # peak-normalized


def test_mix_semantics():
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(1000).astype(np.float32)
    bird = rng.standard_normal(1000).astype(np.float32)
    n, b, m = mix_waveforms(normalize_peak(noise), normalize_peak(bird), eps=0.2)
    for x in (n, b, m):
        assert abs(x.min() + 1) < 1e-6 and abs(x.max() - 1) < 1e-6

    spec = rng.uniform(-80, 0, (16, 16)).astype(np.float32)
    out = midpoint_normalize(spec)
    mmid = (spec.min() + spec.max()) / 2
    np.testing.assert_allclose(out, -((spec - mmid) / mmid), atol=1e-6)


def test_png_export_import_contract(tmp_path):
    assert spec_png_name("XC12345.wav", 12.7) == "XC12345.wav_12_12.png"
    spec = np.random.default_rng(1).uniform(-80, 0, (64, 64)).astype(np.float32)
    p = str(tmp_path / "s.png")
    save_spectrogram_png(spec, p)
    back = load_image_grayscale(p)
    assert back.shape == (64, 64) and 0 <= back.min() and back.max() <= 1

    p2 = str(tmp_path / "s.npy")
    save_spectrogram_npy(spec, p2)
    exact = load_image_grayscale(p2)
    want = (spec - spec.min()) / (spec.max() - spec.min())
    np.testing.assert_allclose(exact, want, atol=1e-6)

    save_generated_png(np.full((32, 32, 1), 128, np.uint8), str(tmp_path / "g.png"))
    g = load_image_grayscale(str(tmp_path / "g.png"))
    assert g.shape == (32, 32)


def test_bootstrap_balancing():
    labels = np.array([0] * 10 + [1] * 3 + [2] * 7)
    idx = bootstrap_balance_indices(labels, np.random.default_rng(0))
    resampled = labels[idx]
    counts = np.bincount(resampled)
    assert (counts == 10).all()


def _make_folder_dataset(root, classes=("a", "b"), per_class=6, size=32):
    rng = np.random.default_rng(0)
    for c in classes:
        os.makedirs(os.path.join(root, c), exist_ok=True)
        for i in range(per_class):
            save_spectrogram_png(
                rng.uniform(-80, 0, (size, size)).astype(np.float32),
                os.path.join(root, c, f"{c}_{i}.png"),
            )


def test_image_folder_pipeline(tmp_path):
    root = str(tmp_path / "train")
    _make_folder_dataset(root)
    src = ImageFolderSource(root, bootstrap_balance=True, img_size=32)
    assert src.classes == ["a", "b"]
    batches = list(iterate_batches(src, batch_size=4, epochs=1))
    assert all(b["image"].shape == (4, 32, 32, 1) for b in batches)
    assert len(batches) == 3  # 12 balanced samples / 4


def test_iterate_batches_skip_resumes_exact_stream(tmp_path):
    """skip_batches + a same-seed fresh source replays the identical
    remaining stream — the mid-epoch resume contract (state.step is the
    full resume position in cli/train_ddpm.py)."""
    root = str(tmp_path / "train")
    _make_folder_dataset(root)

    def fresh():
        return ImageFolderSource(root, bootstrap_balance=True, seed=7, img_size=32)

    full = list(iterate_batches(fresh(), batch_size=4, epochs=2))
    resumed = list(iterate_batches(fresh(), batch_size=4, epochs=2, skip_batches=4))
    assert len(resumed) == len(full) - 4
    for a, b in zip(full[4:], resumed):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])

    # epoch-boundary variant: skipping whole epochs via epoch_indices() calls
    # keeps the shuffle/bootstrap RNG stream aligned (the trainer's skipped-
    # epoch path)
    src = fresh()
    src.epoch_indices()
    second_epoch = list(iterate_batches(src, batch_size=4, epochs=1))
    n_per_epoch = len(full) // 2
    for a, b in zip(full[n_per_epoch:], second_epoch):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_synthetic_mix(tmp_path):
    import pandas as pd

    gen_dir = str(tmp_path / "gen")
    os.makedirs(gen_dir)
    rng = np.random.default_rng(0)
    for cname in ("sparrow", "owl"):
        for samp in range(5):
            save_generated_png(
                rng.integers(0, 255, (16, 16, 1)).astype(np.uint8),
                os.path.join(gen_dir, f"{cname}_gen_imgs_0_{samp}.png"),
            )
    # one file beyond the cap must be excluded
    save_generated_png(np.zeros((16, 16, 1), np.uint8),
                       os.path.join(gen_dir, "owl_gen_imgs_0_999.png"))

    real = pd.DataFrame({"file_name": ["x.png"], "begin_time": [0], "common_name": ["owl"]})
    mixed = synthetic_mix_dataframe(real, gen_dir, ["sparrow", "owl"], per_class=3, cap=250)
    assert len(mixed) == 1 + 6
    assert not any("999" in f for f in mixed["file_name"])


def test_device_prefetch_propagates_errors():
    import pytest

    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.data.pipeline import device_prefetch

    mesh = create_mesh(MeshSpec(data=8))

    def bad_iter():
        yield {"image": np.zeros((4, 8, 8, 1), np.float32)}  # 4 not divisible by 8

    with pytest.raises(Exception):
        list(device_prefetch(bad_iter(), mesh))


def test_neal_test_filter(tmp_path):
    import pandas as pd

    from spectrogramgenai_tpu.data.manifest import neal_test_filter

    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    # only a.wav's png exists on disk
    open(os.path.join(img_dir, "a.wav_3_3.png"), "w").close()
    df = pd.DataFrame({
        "file_name": ["a.wav", "a.wav", "b.wav", "c.wav", "d.wav"],
        "start_time": [3.2, 3.9, 1.0, 2.0, 4.0],
        "end_time": [9, 9, 7, 8, 10],
        "class_label": ["robin", "robin", "wren", "owl", "robin"],
        "confidence": [0.95, 0.99, 0.95, 0.5, 0.95],   # c.wav below threshold
        "labeler": ["dk", "hh", "zz", "dk", "dk"],     # b.wav untrusted labeler
    })
    out = neal_test_filter(df, classes=["owl", "robin", "wren"], image_dir=img_dir)
    # dedup (a.wav,3) → one row; others filtered by labeler/confidence/missing png
    assert len(out) == 1
    assert out.iloc[0]["formatted_file"] == "a.wav_3_3.png"


def test_redistribute_datasets():
    import pandas as pd

    from spectrogramgenai_tpu.utils.misc import redistribute_datasets

    test = pd.DataFrame({"common_name": ["a"] * 6 + ["b"] * 2, "x": range(8)})
    train = pd.DataFrame({"common_name": [], "x": []})
    val = pd.DataFrame({"common_name": [], "x": []})
    test2, train2, val2 = redistribute_datasets(test, train, val, min_test=2)
    assert (test2["common_name"].value_counts() == 2).all()
    assert len(train2) + len(val2) == 4  # the 4 surplus 'a' rows
    assert abs(len(train2) - len(val2)) <= 1


def test_mix_batch_specs():
    from spectrogramgenai_tpu.audio.mix import mix_batch_specs
    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig

    cfg = SpectrogramConfig(sample_rate=8000, n_fft=512, hop_length=96,
                            n_mels=64, num_frames=64)
    rng = np.random.default_rng(0)
    n = 2**13
    noise = rng.standard_normal((2, n)).astype(np.float32)
    bird = rng.standard_normal((2, n)).astype(np.float32)
    eps = np.array([0.1, 0.25])
    ns, bs, ms = mix_batch_specs(noise, bird, eps, cfg, use_pallas=False)
    for s in (ns, bs, ms):
        assert s.shape == (2, cfg.n_mels, cfg.num_frames)
        # midpoint normalization: (min+max)/2 maps to 0-ish, extremes to ±1
        for row in s:
            assert abs((row.min() + row.max()) / 2) < 1e-3


def test_load_specdata_manifest_roundtrip(tmp_path):
    # D10: the reference's specdata.npz contract (train_df/test_df/categories,
    # loaded at train_acgan.py:24,53-55 / gen_specs.py:12-19)
    import pandas as pd

    from spectrogramgenai_tpu.data.manifest import load_specdata_manifest

    train = np.array([["a.wav", "robin", 0.5], ["b.wav", "wren", 1.0]], dtype=object)
    test = np.array([["c.wav", "robin", 2.0]], dtype=object)
    path = tmp_path / "specdata.npz"
    np.savez(path, train_df=train, test_df=test,
             categories=np.array(["robin", "wren"]),
             columns=np.array(["file", "common_name", "begin_time"]))
    train_df, test_df, cats = load_specdata_manifest(str(path))
    assert cats == ["robin", "wren"]
    assert list(train_df.columns) == ["file", "common_name", "begin_time"]
    assert len(train_df) == 2 and len(test_df) == 1
    assert test_df.iloc[0]["file"] == "c.wav"

    # columns embedded in the npz are optional (positional fallback)
    np.savez(tmp_path / "specdata2.npz", train_df=train, test_df=test,
             categories=np.array(["robin", "wren"]))
    train_df2, _, _ = load_specdata_manifest(str(tmp_path / "specdata2.npz"))
    assert list(train_df2.columns) == ["col0", "col1", "col2"]
    assert isinstance(train_df2, pd.DataFrame)


def test_dataframe_source_indices_and_embeddings(tmp_path):
    # D4 direct: SpecDatasetImInd semantics — 11 acoustic-index columns +
    # BirdNET embedding CSV-string column ride along with each sample
    import pandas as pd

    from spectrogramgenai_tpu.audio.export import save_spectrogram_png, spec_png_name
    from spectrogramgenai_tpu.data.pipeline import DataFrameImageSource

    root = str(tmp_path)
    ind_cols = ["ACI", "ADiv", "AEve", "BioA", "H", "Ht", "M", "NDSI",
                "NDSIAnthro", "NDSIBio", "AR"]
    rows = []
    rng = np.random.default_rng(0)
    for i, cname in enumerate(["robin", "wren"]):
        fname = f"clip{i}.wav"
        spec = rng.standard_normal((32, 32)).astype(np.float32)
        save_spectrogram_png(spec, os.path.join(root, spec_png_name(fname, 0)))
        row = {"file_name": fname, "begin_time": 0, "common_name": cname,
               "embeddings": ",".join(str(v) for v in np.arange(4) + i)}
        row.update({c: float(i * 11 + j) for j, c in enumerate(ind_cols)})
        rows.append(row)
    df = pd.DataFrame(rows)

    src = DataFrameImageSource(df, root, ["robin", "wren"], indices_columns=ind_cols)
    s = src.load(1)
    assert s["a_ind"].shape == (11,) and s["a_ind"].dtype == np.float32
    np.testing.assert_allclose(s["a_ind"], np.arange(11) + 11.0)
    np.testing.assert_allclose(s["embedding"], [1.0, 2.0, 3.0, 4.0])
    assert s["label"] == 1

    # whole-batch path carries the same extras
    b = src.load_batch(np.array([0, 1]))
    assert b["a_ind"].shape == (2, 11) and b["embedding"].shape == (2, 4)


def test_decoded_cache_identical_batches_one_decode(tmp_path, monkeypatch):
    """cache_decoded=True serves identical batches to the uncached path and
    decodes each image exactly once across epochs; a too-small budget
    disables the cache (behavior identical to uncached)."""
    import spectrogramgenai_tpu.data.pipeline as pl

    root = str(tmp_path / "train")
    _make_folder_dataset(root)

    calls = {"n_images": 0}
    orig = pl.decode_gray_batch

    def counting(paths, h, w, num_threads=8):
        calls["n_images"] += len(paths)
        return orig(paths, h, w, num_threads=num_threads)

    monkeypatch.setattr(pl, "decode_gray_batch", counting)

    plain = pl.ImageFolderSource(root, bootstrap_balance=True, seed=3, img_size=32)
    cached = pl.ImageFolderSource(root, bootstrap_balance=True, seed=3, img_size=32,
                                  cache_decoded=True)
    for a, b in zip(iterate_batches(plain, 4, epochs=2), iterate_batches(cached, 4, epochs=2)):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])

    cached.load_batch(np.arange(len(cached.paths)))  # fully warm (bootstrap
    # resampling draws WITH replacement, so epochs alone may miss an image)
    calls["n_images"] = 0
    list(iterate_batches(cached, 4, epochs=3))
    assert calls["n_images"] == 0  # fully warm: zero decodes

    # budget too small → one warning, decode-per-epoch behavior preserved
    plain2 = pl.ImageFolderSource(root, bootstrap_balance=True, seed=3, img_size=32)
    tiny = pl.ImageFolderSource(root, bootstrap_balance=True, seed=3, img_size=32,
                                cache_decoded=True, cache_budget_mb=0)
    for a, b in zip(iterate_batches(plain2, 4, epochs=1), iterate_batches(tiny, 4, epochs=1)):
        np.testing.assert_array_equal(a["image"], b["image"])
    assert tiny._cache_enabled is False


def test_decoded_cache_grows_with_injected_synthetic(tmp_path):
    """_inject_synthetic appends paths after construction — the cache must
    re-size instead of indexing out of bounds."""
    from spectrogramgenai_tpu.data.pipeline import ImageFolderSource

    root = str(tmp_path / "train")
    _make_folder_dataset(root, per_class=3)
    src = ImageFolderSource(root, img_size=32, cache_decoded=True)
    first = src.load_batch(np.arange(6))  # warm the 6-image cache
    # simulate the synthetic-injection mutation
    src.paths = list(src.paths) + [src.paths[0], src.paths[1]]
    src.labels = np.concatenate([src.labels, src.labels[:2]])
    grown = src.load_batch(np.asarray([6, 7, 0]))
    np.testing.assert_array_equal(grown["image"][2], first["image"][0])
    np.testing.assert_array_equal(grown["image"][0], first["image"][0])  # same file
    np.testing.assert_array_equal(grown["label"], [0, 0, 0])
