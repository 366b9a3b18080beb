"""ACGAN generator/discriminator + CBAM (flax linen, NHWC).

Capability parity with reference gan_models.py:6-230:
  * Generator: Dense(noise → 512·16·16) → 4 GeneratorBlocks
    (512→256→128→64→32, nearest ×2 upsample each) → CBAM → 3×3 conv → 1ch.
    NOTE the reference block applies conv1/bn1/relu1 TWICE with the same
    weights (gan_models.py:27-34) — a weight-tied double conv. We replicate
    the actual compute (SURVEY.md §7 quirks): same layer applied twice.
  * CBAM: channel attention (shared 1×1-conv MLP over avg+max pooled stats,
    ratio 16) × spatial attention (channel mean/max concat → 7×7 conv).
  * Discriminator: plain 3×3 conv 1→16, then 4 spectral-norm stride-2 conv
    blocks 16→256 with LeakyReLU(0.2); flatten; spectral-norm heads:
    real/fake sigmoid, class log-softmax, and (Ind variant) an 11-way
    acoustic-index regression head.

Spectral norm uses flax's power-iteration wrapper; its u/v state lives in
the ``batch_stats`` collection and is updated inside the train step.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from spectrogramgenai_tpu.models.layers import upsample_nearest


class GeneratorBlock(nn.Module):
    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv1 = nn.Conv(self.in_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")
        bn1 = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")

        x_init = x
        # Weight-tied double application (reference quirk, gan_models.py:27-34).
        x = nn.relu(bn1(conv1(x)))
        x = nn.relu(bn1(conv1(x)))
        x = x + x_init

        x = upsample_nearest(x, 2)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(x)
        return nn.relu(x)


class ChannelAttention(nn.Module):
    channels: int
    ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Shared MLP (1×1 convs without bias) over avg- and max-pooled stats.
        hidden = max(1, self.channels // self.ratio)
        fc1 = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.channels, use_bias=False, dtype=self.dtype, name="fc2")
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return jax.nn.sigmoid(out)[:, None, None, :]


class SpatialAttention(nn.Module):
    kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        y = nn.Conv(1, (self.kernel_size, self.kernel_size), padding=self.kernel_size // 2,
                    use_bias=False, dtype=self.dtype)(y)
        return jax.nn.sigmoid(y)


class CBAM(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ChannelAttention(self.channels, dtype=self.dtype)(x) * x
        x = SpatialAttention(dtype=self.dtype)(x) * x
        return x


class Generator(nn.Module):
    """Noise+one-hot(+indices) vector → 256×256×1 spectrogram."""

    noise_dim: int = 91  # 64 + 27 one-hot (train_acgan.py:109-131)
    output_channels: int = 1
    num_blocks: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = nn.Dense(512 * 16 * 16, dtype=self.dtype, name="initial")(z.astype(self.dtype))
        x = x.reshape(z.shape[0], 16, 16, 512)
        out_c = 512
        for i in range(self.num_blocks):
            in_c, out_c = 512 // (2**i), 512 // (2 ** (i + 1))
            x = GeneratorBlock(in_c, out_c, dtype=self.dtype, name=f"block_{i}")(x, train=train)
        x = CBAM(out_c, dtype=self.dtype)(x)
        x = nn.Conv(self.output_channels, (3, 3), padding=1, dtype=self.dtype, name="final_conv")(x)
        return x.astype(jnp.float32)


class Discriminator(nn.Module):
    """Spectral-norm ACGAN discriminator; optional acoustic-index head."""

    n_classes: int = 27
    n_blocks: int = 4
    n_ind: int | None = None  # set to 11 for the DiscriminatorInd variant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        x = nn.Conv(16, (3, 3), strides=1, padding=1, dtype=dt, name="conv1")(x.astype(dt))
        for i in range(self.n_blocks):
            out_c = 16 * 2 ** (i + 1)
            conv = nn.SpectralNorm(
                nn.Conv(out_c, (3, 3), strides=2, padding=1, dtype=dt, name=f"block_{i}_conv")
            )
            x = conv(x, update_stats=train)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)

        rf = nn.SpectralNorm(nn.Dense(1, dtype=dt, name="layer_rf"))(x, update_stats=train)
        rf = jax.nn.sigmoid(rf.astype(jnp.float32))
        c = nn.SpectralNorm(nn.Dense(self.n_classes, dtype=dt, name="layer_c"))(x, update_stats=train)
        c = jax.nn.log_softmax(c.astype(jnp.float32), axis=-1)
        if self.n_ind is not None:
            a = nn.SpectralNorm(nn.Dense(self.n_ind, dtype=dt, name="layer_ai"))(x, update_stats=train)
            return rf, c, a.astype(jnp.float32)
        return rf, c


def build_noise(key, batch: int, noise_dim: int, num_classes: int, labels, a_ind=None):
    """Reference noise construction (train_acgan.py:235-248): N(0,1) vector of
    size noise_dim+num_classes whose first num_classes dims are overwritten
    with the one-hot label (and the next n_ind with acoustic indices)."""
    z = jax.random.normal(key, (batch, noise_dim + num_classes))
    onehot = jax.nn.one_hot(labels, num_classes, dtype=z.dtype)
    z = z.at[:, :num_classes].set(onehot)
    if a_ind is not None:
        z = z.at[:, num_classes : num_classes + a_ind.shape[-1]].set(a_ind)
    return z
