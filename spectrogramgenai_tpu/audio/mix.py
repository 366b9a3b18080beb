"""Noise/bird mixing pipeline (reference MixDataset, helpers.py:207-290).

Mixes a noise recording and a bird recording with ε ~ U(0, 0.3):
``mix = ε·noise + (1-ε)·bird``, rescales each waveform to [-1, 1] via
min/max, computes the three log-mel spectrograms, and applies the
reference's midpoint normalization ``(s - m)/m`` with sign flip for m<0.

The waveform assembly is host-side NumPy; the three spectrograms ride the
batched TPU mel pipeline.
"""

from __future__ import annotations

import numpy as np

from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig


def rescale_wav(x: np.ndarray) -> np.ndarray:
    """min/max → [-1, 1] (helpers.py:252-254)."""
    x = (x - x.min()) / (x.max() - x.min())
    return 2.0 * (x - 0.5)


def mix_waveforms(noise: np.ndarray, bird: np.ndarray, eps: float):
    mix = eps * noise + (1.0 - eps) * bird
    return rescale_wav(noise), rescale_wav(bird), rescale_wav(mix)


def midpoint_normalize(spec: np.ndarray) -> np.ndarray:
    """(s - m)/m with m = (min+max)/2, negated when m < 0 (helpers.py:276-279)."""
    m = (spec.min() + spec.max()) / 2.0
    out = (spec - m) / m
    return -out if m < 0 else out


def mix_batch_specs(noise_wavs: np.ndarray, bird_wavs: np.ndarray, eps: np.ndarray,
                    cfg: SpectrogramConfig, use_pallas: bool = True):
    """(B,N)+(B,N)+(B,) ε → three (B, n_mels, frames) midpoint-normalized specs."""
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.spectrogram import logmel_spectrogram
    from spectrogramgenai_tpu.ops.mel_kernel import fused_logmel

    triples = [rescale_batch(noise_wavs), rescale_batch(bird_wavs)]
    mix = eps[:, None] * noise_wavs + (1.0 - eps[:, None]) * bird_wavs
    triples.append(rescale_batch(mix))
    stacked = np.concatenate(triples, axis=0)

    fn = fused_logmel if (use_pallas and jax.default_backend() == "tpu") else logmel_spectrogram
    specs = np.asarray(fn(jnp.asarray(stacked), cfg))

    b = noise_wavs.shape[0]
    out = []
    for i in range(3):
        block = specs[i * b : (i + 1) * b]
        out.append(np.stack([midpoint_normalize(s) for s in block]))
    return tuple(out)


def rescale_batch(x: np.ndarray) -> np.ndarray:
    mn = x.min(axis=1, keepdims=True)
    mx = x.max(axis=1, keepdims=True)
    y = (x - mn) / (mx - mn)
    return 2.0 * (y - 0.5)
