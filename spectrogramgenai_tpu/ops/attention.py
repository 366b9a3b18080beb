"""Fused self-attention Pallas kernels (forward + custom-VJP backward).

Why: the reference-parity UNet puts self-attention at every resolution,
including 64×64 → 4096 tokens (reference diff_modules.py:160-166). XLA
materializes the (B·H, 4096, 4096) score matrix in HBM — at sampling batch
54 that's ~7 GB of traffic per block per step (and at batch ≥108 it cannot
even be allocated), so both the reverse chain and the train step are
memory-bound on attention.

These kernels never materialize scores in HBM: K and V for one (batch, head)
sit entirely in VMEM, so each grid step computes softmax(q_block·Kᵀ/√d)·V
with scores living only in VMEM. Exact math (no online-softmax approximation
needed) — verified against the einsum path in tests, gradients included.

Layout notes (the parts that matter on TPU):
  * head_dim here is small (16–64). A (N, d) block would be lane-padded
    d→128 by Mosaic, inflating K/V VMEM ~8×. K and V are therefore passed
    TRANSPOSED as (BH, d, N) so the long token axis sits in the 128-wide
    lane dimension; q stays (q_block, d) (one small padded block).
  * matmuls run in the INPUT dtype (bf16 on the sampling/training path →
    2× MXU throughput vs the old f32 upcast) with fp32 accumulation.
  * softmax is VPU-lean: a row-max reduce + one fused scale+subtract+exp
    pass (exact for any logit magnitude, see _fwd_kernel) + one sum
    reduce, normalization applied to the small (QB, d) output instead of
    the (QB, N) probs. Measured on
    v5e this keeps the VPU fully hidden behind the MXU, whose
    output-tile-pass count is the kernel's hard floor at these head dims
    (d=16 fills only 16/128 of the contraction, an inherent 8× penalty —
    see tools/attn_microbench.py and the PARITY.md performance notes).

The backward is flash-attention style: scores/probs are recomputed per
q-block from the saved Q/K (cheap — they were never written to HBM), dQ is
written per block, and dK/dV accumulate in a VMEM-resident output block
over the sequential q-block grid axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# backward q-block cap for long sequences: the f32 scores/dP blocks are the
# dominant VMEM tenants ((qb, N) each). 256 → 2×4 MB @ N=4096, measured
# fastest that still compiles (512 exceeds VMEM; 128 is 2.6% slower).
_BWD_QB_CAP = 256


def _fwd_kernel(q_ref, kt_ref, vt_ref, o_ref, *, scale: float):
    """softmax(q·kᵀ·scale)·v with a VPU-lean two-pass softmax.

    The naive jax.nn.softmax costs 5 elementwise/reduce passes over the
    (QB, N) scores; at N=4096 the VPU — not the MXU — dominates the kernel
    (measured: K≤256 matmuls are equally fast on the MXU, so the d=16
    contraction is not the constraint). Restructured to keep the VPU work to
    two passes:
      * a per-row max reduce, then scale, max-subtract, exp and the bf16
        cast fused into one pass (the subtraction makes the softmax exact
        for ANY logit magnitude — an earlier ±60 clamp variant silently
        flattened rows whose max logit·scale exceeded 60 — and bounds the
        denominator in [1, N], so 0/0 NaNs are structurally impossible);
      * the row denominator is a VPU reduction (an MXU ones-matmul was
        measured SLOWER — see the inline comment);
      * normalization moves onto the (QB, d) OUTPUT — P·V/r ≡ (P/r)·V by
        linearity — which is 128-256× smaller than the (QB, N) probs.
    """
    q = q_ref[0]           # (QB, d) — input dtype straight to the MXU
    k_t = kt_ref[0]        # (d, N)
    scores = jnp.dot(q, k_t, preferred_element_type=jnp.float32)  # (QB, N) f32
    # row max on raw scores (scale > 0 ⇒ max commutes with scaling)
    rmax = jnp.max(scores, axis=-1, keepdims=True) * scale        # (QB, 1)
    # one fused VPU pass: scale·subtract·exp·cast
    probs = jnp.exp(scores * scale - rmax).astype(vt_ref.dtype)
    # row sums stay on the VPU: an MXU ones-matmul was measured SLOWER (its
    # (QB, 1) output wastes 127/128 lanes over a full-depth contraction —
    # as many tile-passes as the whole P·V matmul)
    denom = jnp.sum(probs.astype(jnp.float32), axis=-1, keepdims=True)  # (QB, 1)
    # (QB, N) · (d, N)ᵀ contraction over N; probs in the value dtype on the MXU
    out = jax.lax.dot_general(
        probs, vt_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, :] = (out / denom).astype(o_ref.dtype)


def _bwd_kernel(q_ref, kt_ref, vt_ref, do_ref, dq_ref, dkt_ref, dvt_ref, *, scale: float):
    """One (bh, q-block) step of the flash-style backward.

    dV = Pᵀ dO;  dP = dO Vᵀ;  dS = P ∘ (dP − rowsum(dP ∘ P));
    dQ = scale · dS K;  dK = scale · dSᵀ Q.
    dK/dV blocks revisit the same output block across the (sequential)
    q-block axis and accumulate in VMEM.
    """
    j = pl.program_id(1)

    q = q_ref[0]                        # (QB, d)
    k_t = kt_ref[0]                     # (d, N)
    v_t = vt_ref[0]                     # (d, N)
    do = do_ref[0].astype(jnp.float32)  # (QB, d)

    # Same VPU-lean max-subtracted softmax as the forward: P = p̃/r with p̃
    # unnormalized. The max shift cancels in every gradient term (softmax is
    # shift-invariant), so this backward is the EXACT softmax VJP. All
    # P-sized (QB, N) elementwise work below is 3 fused passes total; every
    # 1/r normalization is folded into a (QB, ·)-sized operand instead.
    scores = jnp.dot(q, k_t, preferred_element_type=jnp.float32)
    rmax = jnp.max(scores, axis=-1, keepdims=True) * scale
    pt = jnp.exp(scores * scale - rmax).astype(q.dtype)              # pass 1
    r = jnp.sum(pt.astype(jnp.float32), axis=-1, keepdims=True)      # (QB, 1)
    rinv = 1.0 / r

    # dP = dO · V : (QB, d) × (d, N)
    dp = jnp.dot(do.astype(v_t.dtype), v_t, preferred_element_type=jnp.float32)
    # rowsum(dP ∘ P) = rowsum(dP ∘ p̃)/r — fused multiply-reduce (pass 2)
    c = jnp.sum(dp * pt.astype(jnp.float32), axis=-1, keepdims=True) * rinv  # (QB, 1)
    # dS = P ∘ (dP − c)·scale = p̃ ∘ ((dP − c)·scale/r)  (pass 3)
    dsl = (pt * ((dp - c) * (scale * rinv))).astype(q.dtype)

    # dQ = dS · K : contract over N → (QB, d)
    dq = jax.lax.dot_general(dsl, k_t, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0, :, :] = dq.astype(dq_ref.dtype)

    # dKᵀ = Qᵀ dS → (d, N); dVᵀ = (dO/r)ᵀ p̃ → (d, N) (1/r rides on the
    # (QB, d) dO, not on the (QB, N) probs — r varies over the contracted
    # q-token axis)
    dkt = jax.lax.dot_general(q, dsl, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dvt = jax.lax.dot_general((do * rinv).astype(pt.dtype), pt, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dkt_ref[0, :, :] = dkt.astype(dkt_ref.dtype)
        dvt_ref[0, :, :] = dvt.astype(dvt_ref.dtype)

    @pl.when(j > 0)
    def _():
        dkt_ref[0, :, :] += dkt.astype(dkt_ref.dtype)
        dvt_ref[0, :, :] += dvt.astype(dvt_ref.dtype)


def _fwd_call(qf, kt, vt, *, q_block: int, interpret: bool):
    bh, n, d = qf.shape
    scale = 1.0 / (d**0.5)
    n_qb = n // q_block
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh, n_qb),
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), qf.dtype),
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


def _bwd_call(qf, kt, vt, do, *, q_block: int, interpret: bool):
    bh, n, d = qf.shape
    scale = 1.0 / (d**0.5)
    # f32 scores+probs+dP per block: keep 3·QB·N·4 well under VMEM.
    qb = min(q_block, _BWD_QB_CAP) if n >= 2048 else q_block
    n_qb = n // qb
    dq, dkt, dvt = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh, n_qb),
        in_specs=[
            pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            # dK/dV: same block for every j → VMEM-resident accumulator
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, d, n), jnp.float32),
            jax.ShapeDtypeStruct((bh, d, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024,
            # the q-block axis accumulates into dK/dV → sequential
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n * n * d,
            bytes_accessed=8 * bh * n * d * 4,
            transcendentals=bh * n * n,
        ),
        interpret=interpret,
    )(qf, kt, vt, do)
    return dq, dkt, dvt


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_flat(qf, kt, vt, q_block: int, interpret: bool):
    """softmax(q·kᵀ/√d)·v in flat (BH, N, d) / (BH, d, N) layout."""
    return _fwd_call(qf, kt, vt, q_block=q_block, interpret=interpret)


def _attention_flat_fwd(qf, kt, vt, q_block, interpret):
    out = _fwd_call(qf, kt, vt, q_block=q_block, interpret=interpret)
    return out, (qf, kt, vt)


def _attention_flat_bwd(q_block, interpret, residuals, g):
    qf, kt, vt = residuals
    dq, dkt, dvt = _bwd_call(qf, kt, vt, g, q_block=q_block, interpret=interpret)
    return dq, dkt.astype(kt.dtype), dvt.astype(vt.dtype)


_attention_flat.defvjp(_attention_flat_fwd, _attention_flat_bwd)


@functools.partial(jax.jit, static_argnames=("q_block", "interpret"))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, q_block: int | None = None,
                    interpret: bool = False) -> jax.Array:
    """softmax(q·kᵀ/√d)·v over (B, H, N, D) tensors (non-causal, no mask).

    Matches flax MultiHeadDotProductAttention's core exactly (scale 1/√d,
    softmax over keys in fp32). N must be divisible by q_block.
    Differentiable: a flash-style custom VJP recomputes scores per q-block
    instead of saving them, so neither pass touches HBM with an (N, N)
    tensor — usable on the training path as well as sampling.

    q_block=None picks the measured-best block per sequence length
    (tools/attn_microbench.py on v5e): 512 for long sequences — big blocks
    amortize the per-block K/V revisit and keep the VPU exp pass hidden
    behind the MXU — and 128 for short ones, where more grid parallelism
    wins.
    """
    b, h, n, d = q.shape
    if q_block is None:
        q_block = 512 if (n >= 2048 and n % 512 == 0) else min(n, 128)
    if n % q_block:
        raise ValueError(f"sequence length {n} not divisible by q_block {q_block}; "
                         "pad the token axis (the kernel grid would drop trailing tokens)")
    bh = b * h
    qf = q.reshape(bh, n, d)
    kt = k.reshape(bh, n, d).swapaxes(1, 2)  # (BH, d, N): token axis in lanes
    vt = v.reshape(bh, n, d).swapaxes(1, 2)
    out = _attention_flat(qf, kt, vt, q_block, interpret)
    return out.reshape(b, h, n, d)
