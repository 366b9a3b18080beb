"""Native C++ batch WAV decoder vs the scipy reference path."""

import numpy as np
import pytest
from scipy.io import wavfile

from spectrogramgenai_tpu.audio.wavio import load_wav, slice_clip
from spectrogramgenai_tpu.data.native_wav import load_wav_batch, native_available


@pytest.fixture
def wav_files(tmp_path):
    rng = np.random.default_rng(0)
    sr = 16000
    paths, begins, ends = [], [], []
    for i in range(4):
        wav = (0.4 * np.sin(2 * np.pi * (300 + 100 * i) * np.arange(sr * 10) / sr)).astype(np.float32)
        wav += 0.05 * rng.standard_normal(len(wav)).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        wavfile.write(p, sr, (wav * 32767).astype(np.int16))
        paths.append(p)
        begins.append(float(i))
        ends.append(10.0)
    return paths, begins, ends, sr


def test_batch_load_matches_python_path(wav_files):
    paths, begins, ends, sr = wav_files
    clip_s = 6.0
    clip_n = int(clip_s * sr)
    out, rates = load_wav_batch(paths, begins, ends, clip_s, clip_n)
    assert out.shape == (4, clip_n)
    assert (rates == sr).all()
    for i, p in enumerate(paths):
        wav, got_sr = load_wav(p)
        want = slice_clip(wav, got_sr, begins[i], ends[i], clip_s)
        np.testing.assert_allclose(out[i], want, atol=1e-4)


def test_native_build():
    # The native library should build on this image (g++ present); if it
    # doesn't, the fallback already covered correctness above — but flag it.
    assert native_available(), "native wav_batch library failed to build"


def test_missing_file_zero_row(wav_files, tmp_path):
    paths, begins, ends, sr = wav_files
    clip_n = int(6.0 * sr)
    out, rates = load_wav_batch([paths[0], str(tmp_path / "nope.wav")], [0, 0], [10, 10], 6.0, clip_n)
    assert rates[0] == sr and rates[1] == 0
    assert np.abs(out[1]).max() == 0


def test_stereo_and_float_wavs(tmp_path):
    """Stereo mixdown and IEEE-float WAVs through the native decoder."""
    sr = 8000
    t = np.arange(sr * 8) / sr
    left = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    right = np.sin(2 * np.pi * 880 * t).astype(np.float32)
    stereo = np.stack([left, right], axis=1)
    p1 = str(tmp_path / "stereo.wav")
    wavfile.write(p1, sr, (stereo * 32767).astype(np.int16))
    p2 = str(tmp_path / "float.wav")
    wavfile.write(p2, sr, left)  # float32 WAV

    clip_n = 6 * sr
    out, rates = load_wav_batch([p1, p2], [0, 0], [8, 8], 6.0, clip_n)
    assert (rates == sr).all()
    np.testing.assert_allclose(out[0], (left + right)[:clip_n] / 2, atol=1e-3)
    np.testing.assert_allclose(out[1], left[:clip_n], atol=1e-6)
