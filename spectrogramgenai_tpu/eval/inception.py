"""Inception-v3 (flax) + Inception Score / FID math.

Capability parity with the reference eval stack:
  * IS CLI (reference inception_score.py): torchmetrics-style Inception Score
    — folder of PNGs → RGB 299×299 → logits → per-split exp(E[KL(p‖p̄)]),
    splits=10, reported mean±std.
  * FID (reference README.md:58-62 → pytorch-fid): 2048-d pool features →
    Gaussian statistics → Fréchet distance.

The architecture mirrors torchvision's ``inception_v3`` so ImageNet weights
can be converted once with tools/convert_torchvision.py (torchvision is not
bundled in this image; with no weights the extractor still runs — useful for
pipeline tests — but scores are only meaningful with converted weights, and
the CLIs say so loudly).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple[int, int]
    strides: int = 1
    padding: int | tuple = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.features, self.kernel, strides=self.strides, padding=pad,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _avg_pool_same(x, count_include_pad: bool = True):
    """3×3 stride-1 same avg pool. torchvision's inception uses
    F.avg_pool2d defaults (count_include_pad=True); pytorch-fid's patched
    blocks use count_include_pad=False — select via ``fid_pool``."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=count_include_pad)


class InceptionA(nn.Module):
    pool_features: int
    fid_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=dt, name="branch1x1")(x, train)
        b5 = BasicConv2d(48, (1, 1), dtype=dt, name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=dt, name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, (1, 1), dtype=dt, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=dt, name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=dt, name="branch3x3dbl_3")(b3, train)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=dt, name="branch_pool")(
            _avg_pool_same(x, not self.fid_pool), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=2, dtype=dt, name="branch3x3")(x, train)
        bd = BasicConv2d(64, (1, 1), dtype=dt, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=dt, name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, (3, 3), strides=2, dtype=dt, name="branch3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=dt, name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, (1, 1), dtype=dt, name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=dt, name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=dt, name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, (1, 1), dtype=dt, name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=dt, name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=dt, name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=dt, name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=dt, name="branch7x7dbl_5")(bd, train)
        bp = BasicConv2d(192, (1, 1), dtype=dt, name="branch_pool")(
            _avg_pool_same(x, not self.fid_pool), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=dt, name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, (3, 3), strides=2, dtype=dt, name="branch3x3_2")(b3, train)
        b7 = BasicConv2d(192, (1, 1), dtype=dt, name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=dt, name="branch7x7x3_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=dt, name="branch7x7x3_3")(b7, train)
        b7 = BasicConv2d(192, (3, 3), strides=2, dtype=dt, name="branch7x7x3_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    fid_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=dt, name="branch1x1")(x, train)
        b3 = BasicConv2d(384, (1, 1), dtype=dt, name="branch3x3_1")(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=dt, name="branch3x3_2a")(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=dt, name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=dt, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=dt, name="branch3x3dbl_2")(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=dt, name="branch3x3dbl_3a")(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=dt, name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1), dtype=dt, name="branch_pool")(
            _avg_pool_same(x, not self.fid_pool), train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision inception_v3 (aux head omitted — eval only).

    ``fid_pool=True`` selects pytorch-fid's patched avg-pool semantics
    (count_include_pad=False in the A/C/E branch pools); the default matches
    torchvision / torchmetrics (the reference IS path,
    inception_score.py:32-47). Golden-tested against a torch forward in
    tests/test_converters_golden.py.
    """

    num_classes: int = 1000
    fid_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        dt = self.dtype
        fp = self.fid_pool
        x = x.astype(dt)
        x = BasicConv2d(32, (3, 3), strides=2, dtype=dt, name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, (3, 3), dtype=dt, name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=dt, name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), dtype=dt, name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, (3, 3), dtype=dt, name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, fid_pool=fp, dtype=dt, name="Mixed_5b")(x, train)
        x = InceptionA(64, fid_pool=fp, dtype=dt, name="Mixed_5c")(x, train)
        x = InceptionA(64, fid_pool=fp, dtype=dt, name="Mixed_5d")(x, train)
        x = InceptionB(dtype=dt, name="Mixed_6a")(x, train)
        x = InceptionC(128, fid_pool=fp, dtype=dt, name="Mixed_6b")(x, train)
        x = InceptionC(160, fid_pool=fp, dtype=dt, name="Mixed_6c")(x, train)
        x = InceptionC(160, fid_pool=fp, dtype=dt, name="Mixed_6d")(x, train)
        x = InceptionC(192, fid_pool=fp, dtype=dt, name="Mixed_6e")(x, train)
        x = InceptionD(dtype=dt, name="Mixed_7a")(x, train)
        x = InceptionE(fid_pool=fp, dtype=dt, name="Mixed_7b")(x, train)
        x = InceptionE(fid_pool=fp, dtype=dt, name="Mixed_7c")(x, train)
        feats = jnp.mean(x, axis=(1, 2))  # 2048-d pool features (FID)
        if return_features:
            return feats.astype(jnp.float32)
        logits = nn.Dense(self.num_classes, dtype=dt, name="fc")(feats)
        return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Score math (model-independent, tested numerically)
# ---------------------------------------------------------------------------


def inception_score(probs: np.ndarray, splits: int = 10) -> tuple[float, float]:
    """torchmetrics semantics: per split, exp(E_x[KL(p(y|x) ‖ p(y))])."""
    probs = np.asarray(probs, np.float64)
    n = len(probs)
    scores = []
    for part in np.array_split(probs, splits):
        if len(part) == 0:
            continue
        marginal = part.mean(axis=0, keepdims=True)
        kl = np.sum(part * (np.log(part + 1e-12) - np.log(marginal + 1e-12)), axis=1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def gaussian_statistics(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID: ‖μ1−μ2‖² + Tr(Σ1 + Σ2 − 2(Σ1Σ2)^{1/2}) (pytorch-fid math)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def load_inception_params(ckpt_path: str | None):
    """Converted-weights loader; returns None when no checkpoint is available."""
    import os

    if not ckpt_path or not os.path.exists(ckpt_path):
        return None
    from flax import serialization

    model = InceptionV3()
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), train=False)
    with open(ckpt_path, "rb") as f:
        return serialization.from_bytes(jax.device_get(template), f.read())
