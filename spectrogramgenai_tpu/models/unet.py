"""Conditional diffusion UNet (flax linen, NHWC).

Capability-parity rebuild of the reference UNet / UNet_conditional
(diff_modules.py:139-217): 64→128→256→256 encoder with self-attention after
every resolution change, 256→512→512→256 bottleneck (removable deep conv),
three Up blocks with skip concats, sinusoidal time embedding, and class
conditioning added into the time embedding.

TPU-first differences:
  * NHWC layout; compute dtype configurable (bf16 policy, fp32 params).
  * Classifier-free guidance is expressed with a per-sample `cond_mask`
    instead of `y=None`, so the sampler batches the conditional and
    unconditional forward passes into ONE call (2× fewer kernel launches
    in the 999-step reverse chain — see diffusion/ddpm.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from spectrogramgenai_tpu.models.layers import (
    DoubleConv,
    Down,
    SpatialSelfAttention,
    Up,
    sinusoidal_time_embedding,
)


class ConditionalUNet(nn.Module):
    """Diffusion UNet; set ``num_classes=None`` for the unconditional variant."""

    c_in: int = 1
    c_out: int = 1
    time_dim: int = 256
    num_classes: int | None = 27
    remove_deep_conv: bool = False
    width_mult: float = 1.0  # dev/test knob; 1.0 = reference channel plan
    fused_attention: bool = False  # Pallas attention core (sampling path)
    remat_attention: bool = True   # rematerialize SA blocks in backward:
    # the 4096-token score/prob tensors otherwise stay live across the whole
    # backward pass and blow past HBM at training batch sizes.
    dtype: jnp.dtype = jnp.float32

    def _w(self, c: int) -> int:
        return max(8, int(c * self.width_mult))

    def _sa(self, channels: int, idx: int):
        # explicit stable name: nn.remat changes the class name (Checkpoint…)
        # and therefore the auto-generated param keys, which would make
        # checkpoints non-portable between the remat'd (CPU/einsum) and
        # non-remat'd (TPU/fused) paths
        cls = nn.remat(SpatialSelfAttention) if self.remat_attention else SpatialSelfAttention
        return cls(fused=self.fused_attention, channels=channels, dtype=self.dtype,
                   name=f"sa_{idx}")

    @nn.compact
    def __call__(self, x, t, y=None, cond_mask=None):
        dt = self.dtype
        w = self._w
        t_emb = sinusoidal_time_embedding(t, self.time_dim, dtype=dt)
        if self.num_classes is not None:
            if y is None:
                y = jnp.zeros((x.shape[0],), jnp.int32)
                cond_mask = jnp.zeros((x.shape[0],), jnp.float32)
            lab = nn.Embed(self.num_classes, self.time_dim, dtype=dt, name="label_emb")(y)
            if cond_mask is not None:
                lab = lab * cond_mask.astype(lab.dtype)[:, None]
            t_emb = t_emb + lab

        x = x.astype(dt)
        x1 = DoubleConv(w(64), dtype=dt)(x)
        x2 = Down(w(64), w(128), dtype=dt)(x1, t_emb)
        x2 = self._sa(w(128), 0)(x2)
        x3 = Down(w(128), w(256), dtype=dt)(x2, t_emb)
        x3 = self._sa(w(256), 1)(x3)
        x4 = Down(w(256), w(256), dtype=dt)(x3, t_emb)
        x4 = self._sa(w(256), 2)(x4)

        if self.remove_deep_conv:
            x4 = DoubleConv(w(256), dtype=dt)(x4)
            x4 = DoubleConv(w(256), dtype=dt)(x4)
        else:
            x4 = DoubleConv(w(512), dtype=dt)(x4)
            x4 = DoubleConv(w(512), dtype=dt)(x4)
            x4 = DoubleConv(w(256), dtype=dt)(x4)

        xu = Up(w(512), w(128), dtype=dt)(x4, x3, t_emb)
        xu = self._sa(w(128), 3)(xu)
        xu = Up(w(256), w(64), dtype=dt)(xu, x2, t_emb)
        xu = self._sa(w(64), 4)(xu)
        xu = Up(w(128), w(64), dtype=dt)(xu, x1, t_emb)
        xu = self._sa(w(64), 5)(xu)
        return nn.Conv(self.c_out, (1, 1), dtype=dt, name="outc")(xu).astype(jnp.float32)


def UNet(**kwargs) -> ConditionalUNet:
    """Unconditional variant (reference UNet, diff_modules.py:139-201)."""
    kwargs.setdefault("num_classes", None)
    return ConditionalUNet(**kwargs)
