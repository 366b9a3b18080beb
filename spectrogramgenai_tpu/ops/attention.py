"""Fused self-attention Pallas kernel for the UNet's spatial attention.

Why: the reference-parity UNet puts self-attention at every resolution,
including 64×64 → 4096 tokens (diff_modules.py:160-166). XLA materializes
the (B·H, 4096, 4096) score matrix in HBM — at sampling batch 54 that's
~7 GB of traffic per block per step (and at batch ≥108 it cannot even be
allocated), so the reverse chain is memory-bound.

This kernel never materializes scores in HBM: K and V for one (batch, head)
sit entirely in VMEM, so each grid step computes softmax(q_block·Kᵀ/√d)·V
with scores living only in VMEM. Exact math (no online-softmax approximation
needed) — verified against the einsum path in tests.

Layout note (the part that matters on TPU): head_dim here is small (16–64).
A (N, d) block would be lane-padded d→128 by Mosaic, inflating K/V VMEM ~8×
and overflowing VMEM at N=4096. K and V are therefore passed TRANSPOSED as
(B, H, d, N) so the long token axis sits in the 128-wide lane dimension;
q stays (q_block, d) (one small padded block).

Used in the sampling/inference path; training keeps the XLA einsum path
(differentiable, fine at training batch sizes with remat).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, kt_ref, vt_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)     # (QB, d)
    k_t = kt_ref[0].astype(jnp.float32)  # (d, N)
    v_t = vt_ref[0].astype(jnp.float32)  # (d, N)
    scores = jnp.dot(q, k_t, preferred_element_type=jnp.float32) * scale  # (QB, N)
    probs = jax.nn.softmax(scores, axis=-1)
    # (QB, N) · (d, N)ᵀ contraction over N
    out = jax.lax.dot_general(
        probs, v_t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, :, :] = out.astype(o_ref.dtype)


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
    kt = k.reshape(bh, n, d).swapaxes(1, 2)  # (BH, d, N): token axis in lanes
    vt = v.reshape(bh, n, d).swapaxes(1, 2)
    n_qb = n // q_block

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(bh, n_qb),
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024,
            # every (bh, q-block) step is independent → spread over both
            # v5e megacores
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * d,
            bytes_accessed=4 * bh * n * d * 4,
            transcendentals=bh * n * n,
        ),
        interpret=interpret,
    )(qf, kt, vt)
    return out.reshape(b, h, n, d)
