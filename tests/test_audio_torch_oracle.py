"""Cross-validation of the mel pipeline against torch.stft (an independent
FFT implementation with the same Hann/centered conventions)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from spectrogramgenai_tpu.audio import SpectrogramConfig, reference_logmel_np
from spectrogramgenai_tpu.audio.mel import hann_window, mel_filterbank


def test_logmel_matches_torch_stft_oracle():
    cfg = SpectrogramConfig(sample_rate=22050)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(cfg.clip_samples).astype(np.float32)

    pad = cfg.n_fft // 2
    x = torch.from_numpy(np.pad(audio, (pad, pad))).double()
    w = torch.from_numpy(hann_window(cfg.n_fft)).double()
    st = torch.stft(
        x, n_fft=cfg.n_fft, hop_length=cfg.hop_length, window=w, center=False, return_complex=True
    )
    power = (st.abs() ** 2).numpy()  # (freq, time)

    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels).astype(np.float64)
    mel = fb @ power
    ref = mel.max()
    db = 10 * np.log10(np.maximum(1e-10, mel)) - 10 * np.log10(np.maximum(1e-10, ref))
    db = np.maximum(db, db.max() - cfg.top_db)[:, : cfg.num_frames]

    mine = reference_logmel_np(audio, cfg)
    np.testing.assert_allclose(mine, db, atol=1e-4)
