"""Fused self-attention Pallas kernel for the UNet's spatial attention.

Why: the reference-parity UNet puts self-attention at every resolution,
including 64×64 → 4096 tokens (diff_modules.py:160-166). XLA materializes
the (B·H, 4096, 4096) score matrix in HBM — at sampling batch 54 that's
~7 GB of traffic per block per step, which dominates the 999-step chain
(memory-bound, not FLOP-bound).

This kernel never materializes scores in HBM: K and V for one (batch, head)
are small enough to sit entirely in VMEM (≤4096×64 fp32 = 1 MB), so each
grid step computes softmax(q_block·Kᵀ/√d)·V with scores living only in
VMEM. Exact math (no online-softmax approximation needed), identical to the
unfused einsum path — verified in tests.

Used in the sampling/inference path; training keeps the XLA einsum path
(which is differentiable and fine at training batch sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (QB, D)
    k = k_ref[0].astype(jnp.float32)  # (N, D)
    v = v_ref[0].astype(jnp.float32)  # (N, D)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (QB, N)
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[0, :, :] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block", "interpret"))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, q_block: int = 256,
                    interpret: bool = False) -> jax.Array:
    """softmax(q·kᵀ/√d)·v over (B, H, N, D) tensors (non-causal, no mask).

    Matches flax MultiHeadDotProductAttention's core exactly (scale 1/√d,
    softmax over keys). N must be divisible by q_block.
    """
    b, h, n, d = q.shape
    scale = 1.0 / (d**0.5)
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)
    n_qb = n // q_block

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(bh, n_qb),
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * d,
            bytes_accessed=4 * bh * n * d * 4,
            transcendentals=bh * n * n,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)
