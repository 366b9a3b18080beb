"""Measure the fused mel kernel's precision/throughput trade across MXU
matmul precisions (HIGHEST / HIGH / DEFAULT) on the real TPU.

The DFT sums cancel heavily at quiet bins, so the question is how much
dB-domain error each precision leaves vs the float64 NumPy oracle
(`reference_logmel_np`) — on signals designed to stress it: tones over a
wide dynamic range, broadband noise, near-silence, and real-ish mixtures.

Run from the repo root: python tools/mel_precision_bench.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from spectrogramgenai_tpu.audio.spectrogram import (  # noqa: E402
    SpectrogramConfig,
    reference_logmel_np,
)
from spectrogramgenai_tpu.ops.mel_kernel import fused_logmel  # noqa: E402


def stress_audio(cfg: SpectrogramConfig, n_clips: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = cfg.clip_samples
    t = np.arange(n) / cfg.sample_rate
    clips = []
    for i in range(n_clips):
        kind = i % 4
        if kind == 0:  # loud multitone + quiet tail tone (cancellation stress)
            x = np.sin(2 * np.pi * 440 * t) + 1e-4 * np.sin(2 * np.pi * 9000 * t)
        elif kind == 1:  # broadband noise, wide amplitude range
            x = rng.standard_normal(n) * 10.0 ** rng.uniform(-4, 0)
        elif kind == 2:  # near-silence with a faint chirp
            f0, f1 = 500, 8000
            phase = 2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * t[-1]))
            x = 1e-3 * np.sin(phase) + 1e-6 * rng.standard_normal(n)
        else:  # tone + noise mixture (the reference's actual regime)
            x = 0.5 * np.sin(2 * np.pi * rng.uniform(200, 10000) * t)
            x = x + 0.05 * rng.standard_normal(n)
        clips.append(x.astype(np.float32))
    return np.stack(clips)


def main() -> None:
    cfg = SpectrogramConfig()
    batch = 64
    audio_np = stress_audio(cfg, batch)
    audio = jnp.asarray(audio_np)

    oracle = np.stack([reference_logmel_np(a, cfg) for a in audio_np])

    from spectrogramgenai_tpu.utils.benchtools import timeit_device

    for exact in (True, "high", False):
        fn = jax.jit(lambda x, e=exact: fused_logmel(x, cfg, exact=e))
        out = np.asarray(fn(audio))
        err = np.abs(out - oracle).max()

        dt = timeit_device(fn, audio, iters=30)
        print(f"exact={exact!r:8}: max_err={err:.6f} dB  "
              f"{batch / dt:8.1f} specs/s  ({dt * 1e3:6.2f} ms/batch{batch})")


if __name__ == "__main__":
    main()
