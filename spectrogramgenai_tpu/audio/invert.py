"""Spectrogram → audio inversion: mel NNLS inverse + momentum Griffin-Lim.

Fills the workflow gap between generation and FAD: the reference scores FAD
on *audio* directories (reference src/fad.py:11-24, CLAP @ 48 kHz) but its
generators only emit viridis spectrogram PNGs (reference
src/diff_modules.py:771-775) — it ships no spectrogram→audio path at all.
This module reconstructs waveforms from either exact dB mel arrays (.npy)
or the uint8 grayscale PNG read-back, entirely on-device:

  * mel power → linear power: multiplicative-update NNLS (the same problem
    librosa.feature.inverse.mel_to_stft solves per-column with scipy nnls),
    expressed as batched MXU matmuls under a ``lax.scan``.
  * linear magnitude → waveform: fast Griffin-Lim (Perraudin et al. 2013
    momentum form, librosa.griffinlim semantics), one ISTFT + one STFT per
    iteration, scan-compiled into a single jitted program.
  * dB → power: inverse of ``power_to_db(ref=max)`` up to the per-sample
    scale (``ref=max`` destroyed absolute level), so outputs are
    peak-normalized waveforms.

Everything is float32 jnp on static shapes; the whole chain jits once per
(batch, frames) shape and runs on TPU or CPU identically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig, _constants, frame_signal


def stft_complex(audio: jax.Array, cfg: SpectrogramConfig) -> jax.Array:
    """(B, N) → (B, T, n_bins) complex STFT (hann window, centered)."""
    window, _ = _constants(cfg)
    frames = frame_signal(audio, cfg) * jnp.asarray(window)
    return jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)


def _overlap_add(frames: jax.Array, hop: int, total: int) -> jax.Array:
    """(B, T, n_fft) windowed frames → (B, total) overlap-add, scatter-free.

    TPU scatters are slow (the original ``.at[idx].add`` version made ISTFT
    4× the cost of the forward STFT). Instead, split each frame into
    ``span = ceil(n_fft/hop)`` hop-sized pieces: piece j of frame f lands
    exactly on output row f+j, so the whole overlap-add is `span`
    static-slice adds (XLA pad+add — fully parallel). Measured: ISTFT
    15.3 → ~4 ms at the (27, 346, 2048) serving geometry."""
    b, t, n_fft = frames.shape
    span = -(-n_fft // hop)
    pad = span * hop - n_fft
    pieces = jnp.pad(frames, ((0, 0), (0, 0), (0, pad))).reshape(b, t, span, hop)
    rows = jnp.zeros((b, t + span, hop), frames.dtype)
    for j in range(span):
        rows = rows.at[:, j : j + t].add(pieces[:, :, j])
    return rows.reshape(b, (t + span) * hop)[:, :total]


@functools.lru_cache(maxsize=64)
def _nola_inv(cfg: SpectrogramConfig, t: int) -> np.ndarray:
    """1 / (summed squared window) for a t-frame ISTFT — a constant per
    (config, frame count), precomputed on host (it used to be a second
    on-device overlap-add every call)."""
    window, _ = _constants(cfg)
    hop = cfg.hop_length
    total = (t - 1) * hop + cfg.n_fft
    norm = np.zeros(total, np.float64)
    wsq = (window.astype(np.float64)) ** 2
    for f in range(t):
        norm[f * hop : f * hop + cfg.n_fft] += wsq
    return (1.0 / np.maximum(norm, 1e-10)).astype(np.float32)


def istft(stft_c: jax.Array, cfg: SpectrogramConfig, length: int | None = None) -> jax.Array:
    """(B, T, n_bins) complex → (B, length) inverse STFT.

    librosa.istft semantics: synthesis-windowed overlap-add normalized by
    the summed squared window (NOLA; hann @ hop 384 / n_fft 2048 satisfies
    it), center padding trimmed. Default length = (T-1)·hop for centered
    input — what a T-frame spectrogram determines.
    """
    window, _ = _constants(cfg)
    win = jnp.asarray(window)
    b, t, _ = stft_c.shape
    frames = jnp.fft.irfft(stft_c, n=cfg.n_fft, axis=-1) * win

    total = (t - 1) * cfg.hop_length + cfg.n_fft
    out = _overlap_add(frames, cfg.hop_length, total)
    out = out * jnp.asarray(_nola_inv(cfg, t))

    pad = cfg.n_fft // 2 if cfg.center else 0
    if length is None:
        length = (t - 1) * cfg.hop_length if cfg.center else total
    if pad + length > total:
        # librosa semantics: zero-pad past the reconstructable span instead
        # of letting dynamic_slice clamp the start (a silent time shift)
        out = jnp.pad(out, ((0, 0), (0, pad + length - total)))
    return jax.lax.dynamic_slice_in_dim(out, pad, length, axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "n_iter", "length"))
def griffin_lim(
    mag: jax.Array,
    cfg: SpectrogramConfig,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
    key: jax.Array | None = None,
) -> jax.Array:
    """Fast Griffin-Lim: (B, T, n_bins) magnitude → (B, length) waveform.

    librosa.griffinlim parity: momentum-accelerated alternating projection
    (rebuilt − momentum/(1+momentum)·previous, re-normalized to unit
    modulus), ``n_iter`` scan-compiled STFT/ISTFT pairs. ``key=None`` uses
    deterministic all-ones phase init; pass a PRNG key for random init.
    """
    if key is None:
        angles = jnp.ones_like(mag).astype(jnp.complex64)
    else:
        phase = jax.random.uniform(key, mag.shape, jnp.float32, -np.pi, np.pi)
        angles = jnp.exp(1j * phase.astype(jnp.complex64))

    t = mag.shape[1]
    # iterate at the full span the T frames determine so rebuilt keeps T
    # frames regardless of the requested output `length` (shorter lengths
    # previously shape-mismatched inside the scan); `length` only applies
    # to the final synthesis
    span = (t - 1) * cfg.hop_length if cfg.center else (t - 1) * cfg.hop_length + cfg.n_fft
    alpha = momentum / (1.0 + momentum)

    def step(carry, _):
        angles, tprev = carry
        inverse = istft(mag * angles, cfg, length=span)
        rebuilt = stft_complex(inverse, cfg)[:, :t, :]
        new = rebuilt - alpha * tprev
        new = new / jnp.maximum(jnp.abs(new), 1e-16)
        return (new, rebuilt), None

    (angles, _), _ = jax.lax.scan(step, (angles, jnp.zeros_like(angles)), None, length=n_iter)
    return istft(mag * angles, cfg, length=length if length is not None else span)


@functools.lru_cache(maxsize=16)
def _nnls_constants(cfg: SpectrogramConfig):
    """(gram = fbᵀfb, Lipschitz constant) for the NNLS objective, per config."""
    _, fb = _constants(cfg)
    gram = (fb.T @ fb).astype(np.float64)
    lip = float(np.linalg.eigvalsh(gram).max())
    return gram.astype(np.float32), lip


@functools.partial(jax.jit, static_argnames=("cfg", "n_iter"))
def mel_power_to_stft_power(mel: jax.Array, cfg: SpectrogramConfig, n_iter: int = 32) -> jax.Array:
    """(B, n_mels, T) mel power → (B, T, n_bins) linear power (NNLS).

    Solves min_{S≥0} ‖fb·S − mel‖² — the problem
    librosa.feature.inverse.mel_to_stft hands to scipy's active-set nnls
    per column — with FISTA (projected accelerated gradient): each
    iteration is one (n_bins × n_bins)·(n_bins × T) MXU matmul plus fused
    elementwise updates, so the whole batched solve is one scanned jit.
    Measured convergence (64-mel tone mix): 0.1% mel-reprojection error at
    32 iterations vs 2.3% for 48 Lee–Seung multiplicative updates.
    """
    _, fb = _constants(cfg)
    fb = jnp.asarray(fb)  # (M, F)
    gram_np, lip = _nnls_constants(cfg)
    gram = jnp.asarray(gram_np)
    num = jnp.einsum("mf,bmt->bft", fb, mel, precision=jax.lax.Precision.HIGHEST)

    # FISTA momentum schedule is data-independent: t_{k+1} = (1+√(1+4t_k²))/2
    tks = np.ones(n_iter + 1)
    for k in range(n_iter):
        tks[k + 1] = (1.0 + np.sqrt(1.0 + 4.0 * tks[k] ** 2)) / 2.0
    betas = jnp.asarray(((tks[:-1] - 1.0) / tks[1:]).astype(np.float32))

    s0 = jnp.maximum(num / lip, 0.0)

    def step(carry, beta):
        s, y = carry
        grad = jnp.einsum("fg,bgt->bft", gram, y, precision=jax.lax.Precision.HIGHEST) - num
        s_new = jnp.maximum(y - grad / lip, 0.0)
        y_new = s_new + beta * (s_new - s)
        return (s_new, y_new), None

    (s, _), _ = jax.lax.scan(step, (s0, s0), betas)
    return jnp.swapaxes(s, 1, 2)  # (B, T, F)


def resample_wavs(wavs, sr: int, out_sr: int | None):
    """Polyphase-resample a list/array of waveforms; no-op when rates match."""
    if not out_sr or out_sr == sr:
        return list(wavs), sr
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(int(out_sr), int(sr))
    return [resample_poly(np.asarray(w), out_sr // g, sr // g).astype(np.float32)
            for w in wavs], int(out_sr)


def db_to_power(db: jax.Array) -> jax.Array:
    """Inverse of power_to_db up to the lost per-sample ``ref=max`` scale:
    relative power in (0, 1], peak at 1."""
    return jnp.power(10.0, db / 10.0)


def png_unit_to_db(img01: jax.Array, top_db: float = 80.0) -> jax.Array:
    """uint8/255 grayscale PNG read-back → dB, assuming the stored image
    spanned the full ``[peak − top_db, peak]`` clamp range (true for any
    spectrogram where the top_db floor engaged — all real clips; quiet
    synthetic clips recover with compressed dynamics)."""
    return img01 * top_db - top_db


@functools.partial(jax.jit, static_argnames=("cfg", "gl_iters", "nnls_iters"))
def db_mel_to_audio(
    db: jax.Array,
    cfg: SpectrogramConfig,
    gl_iters: int = 32,
    nnls_iters: int = 32,
    key: jax.Array | None = None,
) -> jax.Array:
    """(B, n_mels, T) dB mel spectrogram → (B, (T−1)·hop) peak-normalized audio.

    The full inversion chain (dB → mel power → NNLS linear power → √ →
    Griffin-Lim), one jitted program. Inverse of
    :func:`spectrogram.logmel_spectrogram` up to the per-sample level and
    the phase information both destroyed by the forward pipeline.
    """
    mel_power = db_to_power(db.astype(jnp.float32))
    stft_pow = mel_power_to_stft_power(mel_power, cfg, n_iter=nnls_iters)
    mag = jnp.sqrt(jnp.maximum(stft_pow, 0.0)) if cfg.power == 2.0 else jnp.power(
        jnp.maximum(stft_pow, 0.0), 1.0 / cfg.power)
    wav = griffin_lim(mag, cfg, n_iter=gl_iters, key=key)
    peak = jnp.max(jnp.abs(wav), axis=1, keepdims=True)
    return wav / jnp.maximum(peak, 1e-10)


class AudioReconstructor:
    """Generated uint8 spectrograms → WAV bytes, inverted on device.

    Wraps audio/invert.db_mel_to_audio (FISTA NNLS mel inverse + momentum
    Griffin-Lim) for serving and the generate CLI. Request counts vary, so batches pad
    to power-of-two buckets — jax's jit cache then holds at most
    log2(max_count)+1 compiled programs per image geometry. The first audio
    request per bucket pays that compile (minutes on a cold remote-TPU
    cache); ``warmup()`` front-loads the common buckets at server start.
    """

    def __init__(self, sample_rate: int = 22050, n_fft: int = 2048,
                 hop_length: int = 384, gl_iters: int = 32, nnls_iters: int = 32,
                 top_db: float = 80.0, out_sr: int | None = None):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.gl_iters = gl_iters
        self.nnls_iters = nnls_iters
        self.top_db = top_db
        self.out_sr = out_sr

    def _cfg(self, n_mels: int, n_frames: int):
        from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig

        return SpectrogramConfig(sample_rate=self.sample_rate, n_fft=self.n_fft,
                                 hop_length=self.hop_length, n_mels=n_mels,
                                 num_frames=n_frames)

    def waveforms(self, imgs: np.ndarray) -> tuple[list[np.ndarray], int]:
        """[n, H, W(, 1)] uint8 spectrograms → (n float32 waveforms, sr)."""
        from spectrogramgenai_tpu.audio.invert import db_mel_to_audio

        imgs = np.asarray(imgs)
        if imgs.ndim == 4 and imgs.shape[-1] == 1:
            imgs = imgs[..., 0]
        n, h, w = imgs.shape
        db = imgs.astype(np.float32) / 255.0 * self.top_db - self.top_db
        bucket = 1 << (n - 1).bit_length()  # next power of two
        if bucket > n:
            db = np.concatenate([db, np.zeros((bucket - n, h, w), np.float32)])
        wavs = np.asarray(db_mel_to_audio(db, self._cfg(h, w), gl_iters=self.gl_iters,
                                          nnls_iters=self.nnls_iters))[:n]
        return resample_wavs(wavs, self.sample_rate, self.out_sr)

    def wav_bytes_batch(self, imgs: np.ndarray) -> list[bytes]:
        """[n, H, W(, 1)] uint8 spectrograms → n WAV (16-bit PCM) byte strings."""
        import io

        from scipy.io import wavfile

        wavs, sr = self.waveforms(imgs)
        out = []
        for wv in wavs:
            pcm = (np.clip(wv, -1.0, 1.0) * 32767.0).astype(np.int16)
            buf = io.BytesIO()
            wavfile.write(buf, sr, pcm)
            out.append(buf.getvalue())
        return out

    @property
    def output_sample_rate(self) -> int:
        return self.out_sr or self.sample_rate

    def warmup(self, n_mels: int, n_frames: int, counts=(1,)) -> None:
        """Compile the inversion program for the given image geometry."""
        for c in counts:
            self.wav_bytes_batch(np.zeros((c, n_mels, n_frames), np.uint8))
