"""Fréchet Audio Distance harness (reference fad.py capability).

The reference scores background vs eval audio directories with
``frechet_audio_distance.FrechetAudioDistance`` (CLAP 630k-audioset @48 kHz).
That package (and its torch CLAP tower) is not in this image and there is no
network egress, so the harness is pluggable:

  * ``embeddings`` mode — consume precomputed embedding files
    (.npy per clip or one .npz), exactly how the reference consumes BirdNET
    embeddings as artifacts (SURVEY.md §2.4 E4).
  * ``mel`` mode — a deterministic on-TPU log-mel statistics embedder
    (mean+std over time of the 256-mel log spectrogram, 512-d). CLEARLY
    FLAGGED: valid for relative/regression comparisons in this framework,
    not comparable to published CLAP-FAD numbers.
  * ``clap`` mode — reference-comparable CLAP-FAD on TPU: the flax HTSAT
    audio tower (eval/clap.py, golden-tested vs the HF torch CLAP) embeds
    the clips with weights converted by tools/convert_clap.py. Precomputed
    CLAP embeddings also work via ``embeddings`` mode (the same artifact
    pattern the reference uses for BirdNET).

The Fréchet math is shared with FID (eval/inception.py:frechet_distance).
"""

from __future__ import annotations

import os

import numpy as np

from spectrogramgenai_tpu.eval.inception import frechet_distance, gaussian_statistics

FAD_SAMPLE_RATE = 48000  # reference fad.py:15


def mel_statistics_embeddings(wavs: list[np.ndarray], sr: int, batch: int = 32) -> np.ndarray:
    """512-d embedding: [mean_t, std_t] of the 256-mel log spectrogram."""
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig, logmel_spectrogram

    cfg = SpectrogramConfig(sample_rate=sr)
    n = min(len(w) for w in wavs)
    stack = np.stack([w[:n] for w in wavs]).astype(np.float32)
    out = []
    for i in range(0, len(stack), batch):
        spec = np.asarray(logmel_spectrogram(jnp.asarray(stack[i : i + batch]), cfg))
        out.append(np.concatenate([spec.mean(axis=2), spec.std(axis=2)], axis=1))
    return np.concatenate(out, axis=0)


def load_embeddings(path: str) -> np.ndarray:
    """Directory of per-clip .npy files or a single .npz/.npy matrix."""
    if os.path.isdir(path):
        files = sorted(f for f in os.listdir(path) if f.endswith(".npy"))
        return np.stack([np.load(os.path.join(path, f)) for f in files])
    if path.endswith(".npz"):
        data = np.load(path)
        return data[list(data.keys())[0]]
    return np.load(path)


def embeddings_for_dir(audio_dir: str, mode: str = "mel", target_sr: int = FAD_SAMPLE_RATE,
                       clap_ckpt: str | None = None) -> np.ndarray:
    from spectrogramgenai_tpu.audio.wavio import load_wav

    wavs = []
    for f in sorted(os.listdir(audio_dir)):
        if f.lower().endswith(".wav"):
            w, _ = load_wav(os.path.join(audio_dir, f), target_sr=target_sr)
            wavs.append(w)
    if not wavs:
        raise FileNotFoundError(f"no wav files in {audio_dir}")
    if mode == "mel":
        return mel_statistics_embeddings(wavs, target_sr)
    if mode == "clap":
        from spectrogramgenai_tpu.eval.clap import clap_embeddings, load_clap_params

        if not clap_ckpt:
            raise ValueError("clap mode needs --clap_ckpt (converted via tools/convert_clap.py)")
        if target_sr != FAD_SAMPLE_RATE:
            # the CLAP mel frontend (eval/clap.py) is fixed at 48 kHz — any
            # other load rate would silently time/frequency-misscale the clips
            raise ValueError(f"clap mode requires sample_rate={FAD_SAMPLE_RATE} "
                             f"(got {target_sr}); wavs are resampled on load")
        variables = load_clap_params(clap_ckpt)
        return clap_embeddings(wavs, variables)
    raise ValueError(f"unknown embedding mode {mode!r}")


def fad_score(background: np.ndarray, evaluation: np.ndarray) -> float:
    """Fréchet distance between embedding distributions (clamped ≥ 0:
    sqrtm numerics can produce tiny negatives for near-identical sets)."""
    mu_b, s_b = gaussian_statistics(background)
    mu_e, s_e = gaussian_statistics(evaluation)
    return max(0.0, frechet_distance(mu_b, s_b, mu_e, s_e))
