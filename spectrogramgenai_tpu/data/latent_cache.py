"""Latent caching: pre-encode the dataset once through the frozen VQ encoder.

Latent-diffusion training re-runs the frozen, deterministic VQ-VAE encoder on
the same images every epoch — measured at 22% of the train step at batch 32
(tools/train_ablation.py), plus the full per-epoch host PNG decode. Since the
encoder never updates (reference freezes it, diff_modules.py:612-616) and the
input pipeline applies no stochastic augmentation, encoding is a pure function
of the image: cache it.

``LatentCacheSource`` wraps an image source, encodes every sample once at
construction (device batches through a jitted encode), and then serves
``{"latent", "label"}`` batches straight from host RAM — no PNG decode, no
in-step encode. It delegates ``epoch_indices()`` to the wrapped source, so the
shuffle/bootstrap RNG stream (and therefore batch order, mid-epoch resume and
run-level reproducibility) is identical to the uncached path. Latents are
stored in the encoder's output dtype (f32 for the default VQ-VAE): training
from the cache is semantically identical to on-the-fly encoding — exact in
f32 (tests/test_latent_cache.py, 1e-6); under bf16 compute the cached
encode runs in its own XLA program, so fusion-boundary rounding can differ
in the last bf16 bit (measured 3e-5 relative loss delta on one step at the
production geometry — both paths are valid roundings of the same math).

RAM: one 256×256 image's latent is 64×64×4 f32 = 64 KB (4× smaller than the
decoded f32 image); 100k images ≈ 6.4 GB host RAM.

Measured on v5e (batch 32): 46.4 ms → 36.2 ms per step = 690 → 885 img/s
(1.28×), plus epochs no longer pay the ~1.7-host-cores/chip PNG decode.
"""

from __future__ import annotations

import numpy as np


class LatentCacheSource:
    """Pre-encoded view of an image source for latent-diffusion training.

    Args:
      source: an ImageFolderSource/DataFrameImageSource-like object exposing
        ``load_batch`` (or per-sample ``load``) and ``epoch_indices``.
      encode_fn: jitted batch encode, images [n,H,W,1] in [0,1] → latents
        (DiffusionTask.make_encoder()).
      encode_batch: device batch for the one-off encode pass (pads the tail
        chunk so the jit traces a single shape).
    """

    def __init__(self, source, encode_fn, encode_batch: int = 64,
                 num_threads: int = 8):
        self.source = source
        if hasattr(source, "paths"):        # ImageFolderSource
            n = len(source.paths)
        elif hasattr(source, "df"):         # DataFrameImageSource
            n = len(source.df)
        else:
            n = len(source.labels)
        lat_chunks = []
        labels = np.empty(n, np.int32)
        for start in range(0, n, encode_batch):
            chunk = np.arange(start, min(start + encode_batch, n))
            if hasattr(source, "load_batch"):
                batch = source.load_batch(chunk, num_threads=num_threads)
            else:
                samples = [source.load(int(i)) for i in chunk]
                batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            imgs = batch["image"]
            pad = encode_batch - len(chunk)
            if pad:  # tail chunk: pad to the traced shape, slice after
                imgs = np.concatenate([imgs, np.zeros((pad, *imgs.shape[1:]),
                                                      imgs.dtype)])
            lat_chunks.append(np.asarray(encode_fn(imgs))[: len(chunk)])
            labels[chunk] = batch["label"]
        self.latents = np.concatenate(lat_chunks)
        self.labels = labels

    def epoch_indices(self) -> np.ndarray:
        """Delegates to the wrapped source: identical shuffle/bootstrap RNG
        stream → identical batch order to an uncached run."""
        return self.source.epoch_indices()

    def load_batch(self, chunk: np.ndarray, num_threads: int = 8) -> dict:
        return {"latent": self.latents[chunk], "label": self.labels[chunk]}
