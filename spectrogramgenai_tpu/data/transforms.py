"""On-device batch transforms (jnp, NHWC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def renorm_m1_1(x: jax.Array) -> jax.Array:
    """Per-sample min/max rescale to [-1, 1].

    Parity with the reference ``fast_resize_m1_1`` (helpers.py:305-311,
    covered by the reference's only unit test): reduces over all non-batch
    dims, including the sign trick on the (always non-negative) range.
    """
    axes = tuple(range(1, x.ndim))
    mn = jnp.min(x, axis=axes, keepdims=True)
    mx = jnp.max(x, axis=axes, keepdims=True)
    m = mx - mn
    y = (x - mn) / m
    sign = jnp.where(m >= 0, 1.0, -1.0).astype(x.dtype)
    return sign * 2.0 * (y - 0.5)


def expand_channels(x: jax.Array, n_channels: int) -> jax.Array:
    """(B,H,W,1) → (B,H,W,n) by broadcast (reference inputs.expand, helpers.py:445)."""
    if x.shape[-1] == n_channels:
        return x
    if x.shape[-1] == 1:
        return jnp.repeat(x, n_channels, axis=-1)
    if n_channels == 1:
        return jnp.mean(x, axis=-1, keepdims=True)
    raise ValueError(f"cannot adapt {x.shape[-1]} channels to {n_channels}")


def resize_image(x: jax.Array, size: int) -> jax.Array:
    """NHWC bilinear resize to (size, size) — torchvision T.Resize equivalent."""
    b, h, w, c = x.shape
    if h == size and w == size:
        return x
    return jax.image.resize(x, (b, size, size, c), method="bilinear")
