"""Transformer spectrogram denoiser ("image inpainting" model).

Capability parity with reference gan_models.py:233-281: a 5-conv stride-2
encoder (256² → 8²×512), a 6-layer post-norm transformer encoder (d=512,
8 heads, FFN 2048, ReLU) over the 64 spatial tokens, and a 5-stage
transposed-conv decoder back to 1 channel with tanh.

Used as residual noise reduction: ``x ← renorm(x − net(x))`` before GAN /
classifier training (train_acgan.py:211-215, helpers.py:758-761) and as the
backbone of the source-separation trainer (helpers.py:1084-1181), where
``out_channels=2`` predicts (noise, bird) spectrograms.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer (torch TransformerEncoderLayer defaults)."""

    d_model: int = 512
    num_heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model, dtype=self.dtype
        )(x, x)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype)(x + attn)
        y = nn.Dense(self.d_ff, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype)(x + y)


class TransformerDenoiser(nn.Module):
    out_channels: int = 1
    num_layers: int = 6
    d_model: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dt = self.dtype
        x = x.astype(dt)
        # Encoder: 256 → 130 → 65 → 33 → 17 → 8 (k3 s2; paddings 3,1,1,1,0).
        for feats, pad in ((32, 3), (64, 1), (128, 1), (256, 1)):
            x = nn.relu(nn.Conv(feats, (3, 3), strides=2, padding=pad, dtype=dt)(x))
        x = nn.relu(nn.Conv(self.d_model, (3, 3), strides=2, padding=0, dtype=dt)(x))

        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        for _ in range(self.num_layers):
            tokens = TransformerEncoderLayer(self.d_model, dtype=dt)(tokens, deterministic=deterministic)
        x = tokens.reshape(b, h, w, c)

        # Decoder: 8 → 16 → 32 → 64 → 128 → 256 (stride-2 transposed convs).
        for feats in (256, 128, 64, 32):
            x = nn.relu(nn.ConvTranspose(feats, (3, 3), strides=(2, 2), padding="SAME", dtype=dt)(x))
        x = nn.ConvTranspose(self.out_channels, (3, 3), strides=(2, 2), padding="SAME", dtype=dt)(x)
        return jnp.tanh(x).astype(jnp.float32)
