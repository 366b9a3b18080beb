"""Audio/DSP layer tests: mel filterbank golden values, STFT conventions,
power_to_db semantics, and jnp↔NumPy oracle agreement."""

import numpy as np
import jax.numpy as jnp

from spectrogramgenai_tpu.audio import (
    SpectrogramConfig,
    frame_signal,
    hann_window,
    logmel_spectrogram,
    mel_filterbank,
    mel_frequencies,
    power_to_db,
    reference_logmel_np,
)
from spectrogramgenai_tpu.audio.mel import dft_matrices, fft_frequencies


# Golden values from librosa's published docs for mel_frequencies(n_mels=40)
# with the default Slaney scale, fmin=0, fmax=11025.
LIBROSA_MEL_FREQS_40 = np.array(
    [
        0.0, 85.317, 170.635, 255.952, 341.269, 426.586, 511.904, 597.221,
        682.538, 767.855, 853.173, 938.49, 1024.856, 1119.114, 1222.042,
        1334.436, 1457.167, 1591.187, 1737.532, 1897.337, 2071.84, 2262.393,
        2470.47, 2697.686, 2945.799, 3216.731, 3512.582, 3835.643, 4188.417,
        4573.636, 4994.285, 5453.621, 5955.205, 6502.92, 7101.009, 7754.107,
        8467.272, 9246.028, 10096.408, 11025.0,
    ]
)


def test_mel_frequencies_golden():
    got = mel_frequencies(40, 0.0, 11025.0)
    np.testing.assert_allclose(got, LIBROSA_MEL_FREQS_40, atol=5e-3)


def test_mel_filterbank_shape_and_norm():
    fb = mel_filterbank(sr=22050, n_fft=2048, n_mels=256)
    assert fb.shape == (256, 1025)
    assert np.all(fb >= 0)
    # Slaney-normalized triangles: peak of filter m ≈ 2 / bandwidth.
    freqs = mel_frequencies(258, 0.0, 11025.0)
    bw = freqs[2:] - freqs[:-2]
    peaks = fb.max(axis=1)
    # Peaks can undershoot where FFT resolution is coarse, never overshoot.
    assert np.all(peaks <= 2.0 / bw + 1e-6)
    # Well-resolved filters (log region, wide triangles) should hit the peak.
    hi = slice(200, 256)
    np.testing.assert_allclose(peaks[hi], 2.0 / bw[hi], rtol=0.1)


def test_hann_window_periodic():
    w = hann_window(8)
    expected = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(8) / 8)
    np.testing.assert_allclose(w, expected, atol=1e-7)
    assert w[0] == 0.0  # periodic (fftbins) form


def test_frame_signal_matches_naive():
    cfg = SpectrogramConfig(sample_rate=4000, n_fft=256, hop_length=96, n_mels=32, num_frames=16)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 4000)).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(audio), cfg))

    pad = cfg.n_fft // 2
    for b in range(2):
        x = np.pad(audio[b], (pad, pad))
        n_frames = 1 + (len(x) - cfg.n_fft) // cfg.hop_length
        naive = np.stack([x[i * cfg.hop_length : i * cfg.hop_length + cfg.n_fft] for i in range(n_frames)])
        np.testing.assert_allclose(frames[b], naive, atol=0)


def test_dft_matrices_match_rfft():
    n_fft = 256
    w = hann_window(n_fft)
    wc, ws = dft_matrices(n_fft, w, dtype=np.float64)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, n_fft))
    ref = np.fft.rfft(x * w, axis=-1)
    np.testing.assert_allclose(x @ wc, ref.real, atol=1e-9)
    np.testing.assert_allclose(x @ ws, ref.imag, atol=1e-9)


def test_power_to_db_reference_semantics():
    rng = np.random.default_rng(2)
    s = rng.uniform(0.0, 5.0, size=(3, 16, 16)).astype(np.float32)
    out = np.asarray(power_to_db(jnp.asarray(s)))
    for b in range(3):
        ref = s[b].max()
        expected = 10 * np.log10(np.maximum(1e-10, s[b])) - 10 * np.log10(np.maximum(1e-10, ref))
        expected = np.maximum(expected, expected.max() - 80.0)
        np.testing.assert_allclose(out[b], expected, atol=1e-3)
    assert out.max() <= 1e-4 and out.min() >= -80.0 - 1e-3


def test_logmel_jnp_matches_numpy_oracle():
    cfg = SpectrogramConfig(sample_rate=22050)
    rng = np.random.default_rng(3)
    # Synthetic "bird call": chirps + noise, 6 s.
    t = np.arange(cfg.clip_samples) / cfg.sample_rate
    audio = np.stack(
        [
            np.sin(2 * np.pi * (2000 + 500 * k) * t) * np.exp(-t) + 0.01 * rng.standard_normal(len(t))
            for k in range(2)
        ]
    ).astype(np.float32)

    got = np.asarray(logmel_spectrogram(jnp.asarray(audio), cfg))
    assert got.shape == (2, 256, 256)
    for b in range(2):
        want = reference_logmel_np(audio[b], cfg)
        assert want.shape == (256, 256)
        np.testing.assert_allclose(got[b], want, atol=2e-3)


def test_logmel_range():
    cfg = SpectrogramConfig(sample_rate=22050)
    audio = np.random.default_rng(4).standard_normal((1, cfg.clip_samples)).astype(np.float32)
    out = np.asarray(logmel_spectrogram(jnp.asarray(audio), cfg))
    assert out.max() <= 1e-4
    assert out.min() >= -80.0 - 1e-3


def test_fft_frequencies():
    f = fft_frequencies(22050, 2048)
    assert f.shape == (1025,)
    assert f[0] == 0.0 and f[-1] == 11025.0
