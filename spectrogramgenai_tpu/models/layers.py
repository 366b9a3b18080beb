"""Shared building blocks (flax linen, NHWC, TPU-friendly).

Capability parity with the reference blocks (diff_modules.py:52-136), built
idiomatically: GroupNorm(1)≡LayerNorm-over-(H,W,C), exact align-corners
bilinear upsampling expressed as two constant matmuls (MXU work instead of a
gather), and attention over flattened spatial tokens.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_time_embedding(t: jax.Array, channels: int, dtype=jnp.float32) -> jax.Array:
    """(B,) timesteps → (B, channels) sin/cos embedding.

    Matches the reference encoding (diff_modules.py:168-173):
    inv_freq = 10000^(-2i/channels); emb = [sin(t·f), cos(t·f)].
    """
    half = channels // 2
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / channels))
    ang = t.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1).astype(dtype)


def _align_corners_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) linear-interpolation matrix with align_corners=True.

    Replicates torch nn.Upsample(mode='bilinear', align_corners=True)
    (reference diff_modules.py:120) exactly, as a dense constant so the
    resize compiles to a matmul on the MXU rather than a gather.
    """
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    w = src - lo
    m[np.arange(n_out), lo] += 1.0 - w
    m[np.arange(n_out), hi] += w
    return m


def upsample_bilinear_align_corners(x: jax.Array, scale: int = 2) -> jax.Array:
    """NHWC bilinear ×scale with align_corners=True, as two matmuls."""
    b, h, w, c = x.shape
    ah = jnp.asarray(_align_corners_matrix(h, h * scale), dtype=x.dtype)
    aw = jnp.asarray(_align_corners_matrix(w, w * scale), dtype=x.dtype)
    x = jnp.einsum("Hh,bhwc->bHwc", ah, x)
    x = jnp.einsum("Ww,bhwc->bhWc", aw, x)
    return x


def upsample_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """NHWC nearest-neighbour ×scale (reference GAN generator upsample)."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


class DoubleConv(nn.Module):
    """Conv→GroupNorm(1)→GELU→Conv→GroupNorm(1) [+ residual GELU].

    Parity: diff_modules.py:75-93 (bias-free convs, GroupNorm with one group).
    """

    out_channels: int
    mid_channels: int | None = None
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.mid_channels or self.out_channels
        y = nn.Conv(mid, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(x)
        y = nn.GroupNorm(num_groups=1, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=1, dtype=self.dtype)(y)
        if self.residual:
            return nn.gelu(x + y)
        return y


class SpatialSelfAttention(nn.Module):
    """Token self-attention over the H×W grid (diff_modules.py:52-72).

    LN → 4-head MHA → +residual → (LN→Dense→GELU→Dense) → +residual.

    ``fused=True`` routes the attention core through the Pallas kernel
    (ops/attention.py) — bit-equivalent math, no HBM score matrix; used on
    the sampling path where the 4096-token blocks are memory-bound. The
    einsum path stays for training (differentiable). Both paths share the
    same parameters.
    """

    channels: int
    num_heads: int = 4
    fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        tokens = x.reshape(b, h * w, c)
        ln = nn.LayerNorm(dtype=self.dtype)(tokens)

        dense = functools.partial(
            nn.DenseGeneral, features=(self.num_heads, head_dim), axis=-1, dtype=self.dtype
        )
        q = dense(name="query")(ln)  # (B, N, H, Dh)
        k = dense(name="key")(ln)
        v = dense(name="value")(ln)

        n = h * w
        use_fused = self.fused and n >= 1024 and n % 256 == 0
        if use_fused:
            from spectrogramgenai_tpu.ops.attention import fused_attention

            ctx = fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
            ).transpose(0, 2, 1, 3)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(q.dtype)
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        attn = nn.DenseGeneral(features=c, axis=(-2, -1), dtype=self.dtype, name="out")(ctx)

        tokens = tokens + attn
        y = nn.LayerNorm(dtype=self.dtype)(tokens)
        y = nn.Dense(c, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype)(y)
        tokens = tokens + y
        return tokens.reshape(b, h, w, c)


class TimeEmbedProject(nn.Module):
    """SiLU→Dense projection of the time embedding, broadcast-added (NHWC)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        emb = nn.Dense(self.out_channels, dtype=self.dtype)(nn.silu(t_emb))
        return x + emb[:, None, None, :]


class Down(nn.Module):
    """maxpool2 → DoubleConv(residual) → DoubleConv → +time (diff_modules.py:96-113)."""

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = DoubleConv(self.in_channels, residual=True, dtype=self.dtype)(x)
        x = DoubleConv(self.out_channels, dtype=self.dtype)(x)
        return TimeEmbedProject(self.out_channels, dtype=self.dtype)(x, t_emb)


class Up(nn.Module):
    """bilinear↑2 (align corners) → concat skip → convs → +time (diff_modules.py:116-136)."""

    in_channels: int  # channels AFTER concat
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, t_emb):
        x = upsample_bilinear_align_corners(x, 2)
        x = jnp.concatenate([skip, x], axis=-1)
        x = DoubleConv(self.in_channels, residual=True, dtype=self.dtype)(x)
        x = DoubleConv(self.out_channels, mid_channels=self.in_channels // 2, dtype=self.dtype)(x)
        return TimeEmbedProject(self.out_channels, dtype=self.dtype)(x, t_emb)
