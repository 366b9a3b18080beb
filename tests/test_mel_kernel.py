"""Fused Pallas mel kernel vs the jnp/NumPy oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrogramgenai_tpu.audio import SpectrogramConfig, logmel_spectrogram, mel_power_spectrogram
from spectrogramgenai_tpu.ops.mel_kernel import fused_logmel, fused_mel_power

INTERPRET = jax.default_backend() != "tpu"


def _audio(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(cfg.clip_samples) / cfg.sample_rate
    clips = [
        np.sin(2 * np.pi * (1500 + 700 * k) * t) * np.exp(-0.5 * t) + 0.05 * rng.standard_normal(len(t))
        for k in range(b)
    ]
    return np.stack(clips).astype(np.float32)


@pytest.mark.parametrize("sr", [22050, 32000])
def test_fused_mel_power_matches_jnp(sr):
    cfg = SpectrogramConfig(sample_rate=sr)
    audio = _audio(cfg)
    got = np.asarray(fused_mel_power(jnp.asarray(audio), cfg, interpret=INTERPRET))
    want = np.asarray(mel_power_spectrogram(jnp.asarray(audio), cfg))  # (B, M, T)
    want = np.swapaxes(want, 1, 2)  # (B, T, M)
    assert got.shape == want.shape
    scale = want.max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-6)


def test_fused_logmel_matches_reference_pipeline():
    cfg = SpectrogramConfig(sample_rate=22050)
    audio = _audio(cfg, b=3, seed=1)
    got = np.asarray(fused_logmel(jnp.asarray(audio), cfg, interpret=INTERPRET))
    want = np.asarray(logmel_spectrogram(jnp.asarray(audio), cfg))
    assert got.shape == (3, cfg.n_mels, cfg.num_frames)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_fused_logmel_high_precision_mode():
    """exact="high" (3-pass MXU matmuls) must stay dB-accurate vs the oracle.

    In interpret mode all precisions execute as f32, so this checks the
    plumbing (static-arg dispatch, cache keying per level) everywhere and
    the actual precision trade on TPU; PARITY.md records the measured TPU
    error/throughput for all three levels (tools/mel_precision_bench.py).
    """
    cfg = SpectrogramConfig(sample_rate=22050)
    audio = _audio(cfg, b=2, seed=3)
    want = np.asarray(logmel_spectrogram(jnp.asarray(audio), cfg))
    for exact, tol_db in ((True, 5e-3), ("high", 0.05), (False, 4.0)):
        got = np.asarray(fused_logmel(jnp.asarray(audio), cfg, interpret=INTERPRET, exact=exact))
        assert got.shape == want.shape
        assert np.abs(got - want).max() < tol_db, exact


def test_fused_logmel_long_clip():
    """Arbitrary-length audio streams through the kernel (SURVEY §5: the
    'long-context' answer is batched framing, not ring attention) — a 30 s
    clip yields the full frame count and still matches the jnp oracle."""
    cfg = SpectrogramConfig(sample_rate=22050)
    rng = np.random.default_rng(7)
    n = 30 * cfg.sample_rate
    t = np.arange(n) / cfg.sample_rate
    audio = (np.sin(2 * np.pi * 900 * t) * np.exp(-0.05 * t)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)[None]
    # the uncropped kernel output carries every frame of the 30 s clip…
    power = np.asarray(fused_mel_power(jnp.asarray(audio), cfg, interpret=INTERPRET))
    assert power.shape == (1, cfg.frames_for(n), cfg.n_mels)
    assert cfg.frames_for(n) > 4 * cfg.num_frames
    # …and the dB pipeline applies the reference's first-256-frames crop
    got = np.asarray(fused_logmel(jnp.asarray(audio), cfg, interpret=INTERPRET))
    want = np.asarray(logmel_spectrogram(jnp.asarray(audio), cfg))
    assert got.shape == want.shape == (1, cfg.n_mels, cfg.num_frames)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_fused_logmel_odd_length_audio():
    # Non-multiple-of-hop lengths must still work (padding path).
    cfg = SpectrogramConfig(sample_rate=22050)
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((1, cfg.clip_samples - 1234)).astype(np.float32)
    got = np.asarray(fused_logmel(jnp.asarray(audio), cfg, interpret=INTERPRET))
    want = np.asarray(logmel_spectrogram(jnp.asarray(audio), cfg))
    np.testing.assert_allclose(got, want, atol=5e-3)
