"""Batched log-mel spectrogram pipeline (JAX) + NumPy oracle.

Replicates the reference wav→spec contract (reference src/helpers.py:83-92):

    spec = melspectrogram(y, sr, n_mels=256, hop_length=384)   # n_fft=2048 (librosa default)
    spec = power_to_db(spec, ref=max)[:, :256]                 # top_db=80 clamp

but batched, jit-compilable, and NHWC/TPU friendly. The per-sample
``ref=max`` normalization (a data-dependent reduction) is kept exactly:
each sample is referenced to its own global max and clamped to
``[max - 80 dB, 0]``.

Two device paths share these constants:
  * :func:`logmel_spectrogram` — pure jnp (XLA rfft), the correctness oracle
    on-device and the CPU fallback.
  * ``ops.mel_kernel.fused_logmel`` — the fused Pallas kernel (framing +
    windowed-DFT matmul + power + mel matmul on the MXU).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from spectrogramgenai_tpu.audio import mel as melmath


@dataclasses.dataclass(frozen=True)
class SpectrogramConfig:
    """Static spectrogram parameters (hashable → usable as a jit static arg)."""

    sample_rate: int = 22050
    n_fft: int = 2048  # librosa default — the reference's `nfft=512` only sets the hop
    hop_length: int = 384  # int(0.75 * 512), reference src/helpers.py:90
    n_mels: int = 256
    num_frames: int = 256  # the reference's trailing `[:, :256]` crop
    fmin: float = 0.0
    fmax: float | None = None
    power: float = 2.0
    top_db: float = 80.0
    amin: float = 1e-10
    center: bool = True
    clip_seconds: float = 6.0

    @property
    def n_bins(self) -> int:
        return 1 + self.n_fft // 2

    @property
    def clip_samples(self) -> int:
        return int(self.clip_seconds * self.sample_rate)

    def frames_for(self, num_samples: int) -> int:
        padded = num_samples + (self.n_fft if self.center else 0)
        return 1 + (padded - self.n_fft) // self.hop_length


@functools.lru_cache(maxsize=16)
def _constants(cfg: SpectrogramConfig):
    """Precompute (window, mel filterbank) once per config."""
    window = melmath.hann_window(cfg.n_fft)
    fb = melmath.mel_filterbank(
        sr=cfg.sample_rate,
        n_fft=cfg.n_fft,
        n_mels=cfg.n_mels,
        fmin=cfg.fmin,
        fmax=cfg.fmax,
    )
    return window, fb


def frame_signal(audio: jax.Array, cfg: SpectrogramConfig) -> jax.Array:
    """Frame (B, N) audio into (B, T, n_fft) with centered zero padding.

    Overlapping frames are built by a reshape trick that keeps XLA happy:
    since ``n_fft = k * hop + r`` every frame is a contiguous slice covering
    ceil(n_fft/hop)+1 non-overlapping hop-sized rows, so a single gather of
    row blocks replaces a giant per-sample gather.
    """
    b, n = audio.shape
    pad = cfg.n_fft // 2 if cfg.center else 0
    x = jnp.pad(audio, ((0, 0), (pad, pad)))
    total = x.shape[1]
    n_frames = 1 + (total - cfg.n_fft) // cfg.hop_length

    hop = cfg.hop_length
    # Rows of hop-length samples; frame f starts exactly at row f, so
    # frame f = rows[f : f + span] flattened, cut to n_fft.
    span = -(-cfg.n_fft // hop)
    n_rows = max(n_frames - 1 + span, -(-total // hop))
    x = jnp.pad(x, ((0, 0), (0, n_rows * hop - total)))
    rows = x.reshape(b, n_rows, hop)

    idx = jnp.arange(n_frames)[:, None] + jnp.arange(span)[None, :]  # (T, span)
    frames = rows[:, idx, :].reshape(b, n_frames, span * hop)[:, :, : cfg.n_fft]
    return frames


def stft_power(audio: jax.Array, cfg: SpectrogramConfig) -> jax.Array:
    """(B, N) → (B, T, n_bins) power spectrogram |STFT|^power."""
    window, _ = _constants(cfg)
    frames = frame_signal(audio, cfg) * jnp.asarray(window)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    mag = jnp.abs(spec)
    if cfg.power == 2.0:
        return mag * mag
    return mag**cfg.power


def mel_power_spectrogram(audio: jax.Array, cfg: SpectrogramConfig) -> jax.Array:
    """(B, N) → (B, n_mels, T) mel power spectrogram."""
    _, fb = _constants(cfg)
    power = stft_power(audio, cfg)  # (B, T, F)
    mel = jnp.einsum("btf,mf->bmt", power, jnp.asarray(fb), precision=jax.lax.Precision.HIGHEST)
    return mel


def power_to_db(
    s: jax.Array,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
    ref: jax.Array | None = None,
) -> jax.Array:
    """Per-sample ``power_to_db(S, ref=max)`` over trailing (mel, time) axes.

    Matches the reference's normalization (librosa semantics): values in dB
    relative to each sample's own max, clamped to ``[peak - top_db, ...]``.
    """
    reduce_axes = tuple(range(1, s.ndim))
    if ref is None:
        ref = jnp.max(s, axis=reduce_axes, keepdims=True)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, s))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        peak = jnp.max(log_spec, axis=reduce_axes, keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


@functools.partial(jax.jit, static_argnames=("cfg",))
def logmel_spectrogram(audio: jax.Array, cfg: SpectrogramConfig) -> jax.Array:
    """Full pipeline: (B, N) audio → (B, n_mels, num_frames) log-mel in dB.

    Bit-compatible with the reference wav→spec path (helpers.py:83-92):
    ``power_to_db(ref=max)`` is applied over the FULL spectrogram (the
    reference's ref/top_db peaks see all frames) and only then is the time
    axis cropped to ``cfg.num_frames``.
    """
    mel = mel_power_spectrogram(audio, cfg)
    db = power_to_db(mel, amin=cfg.amin, top_db=cfg.top_db)
    return db[..., : cfg.num_frames]


# ---------------------------------------------------------------------------
# NumPy oracle — used by tests to pin down the jnp and Pallas paths, and as
# the honest CPU baseline in bench.py.
# ---------------------------------------------------------------------------


def reference_logmel_np(audio: np.ndarray, cfg: SpectrogramConfig) -> np.ndarray:
    """Single-clip (N,) → (n_mels, ≤num_frames) log-mel, pure NumPy."""
    window, fb = _constants(cfg)
    pad = cfg.n_fft // 2 if cfg.center else 0
    x = np.pad(audio.astype(np.float64), (pad, pad))
    n_frames = 1 + (len(x) - cfg.n_fft) // cfg.hop_length
    frames = np.stack([x[i * cfg.hop_length : i * cfg.hop_length + cfg.n_fft] for i in range(n_frames)])
    spec = np.fft.rfft(frames * window.astype(np.float64), axis=-1)
    power = np.abs(spec) ** cfg.power
    mel = fb.astype(np.float64) @ power.T  # (n_mels, T)

    # Reference order (helpers.py:92): dB over the full spectrogram, THEN crop.
    ref = mel.max()
    log_spec = 10.0 * np.log10(np.maximum(cfg.amin, mel))
    log_spec -= 10.0 * np.log10(np.maximum(cfg.amin, ref))
    if cfg.top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - cfg.top_db)
    return log_spec[:, : cfg.num_frames].astype(np.float32)
