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
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# backward q-block cap for long sequences: the f32 scores/dP blocks are the
# dominant VMEM tenants ((qb, N) each). 256 → 2×4 MB @ N=4096, measured
# fastest (128 is 2.6% slower; 512 with a 48 MB VMEM limit compiles but
# runs 15× SLOWER — 502 ms vs 34 ms grad at the 4096 site — the ~28 MB of
# live (512, N) tensors leave no room to double-buffer the block pipeline).
# The cap deliberately applies only at N ≥ 2048: at N=1024 the (qb, N)
# blocks are 4× smaller, and qb=512 there (what the fwd auto-select feeds
# through) is measured FASTER than 256, not slower — grad at the 32×32 SA
# training site (B32·H4, N=1024, d=32): 4.82/4.40/4.14/3.98 ms for qb
# 128/256/512/1024, all within the 14 MB VMEM limit.
_BWD_QB_CAP = 256

# Optimistic-softmax fast-path window (see _fwd_kernel). The speculative
# exp clips scaled logits to [_CLIP_LO, _CLIP_HI]; acceptance is decided on
# the ROW SUM r = Σ exp(clip(u)) — which both kernels get for free (the
# forward from the ones-row column of the P·V matmul, the backward from the
# denominator reduce it needs anyway) — via r ∈ [e^_SAFE_LO, e^_SAFE_HI]:
#   * r < e^69 ⇒ every term < e^69, and since the row max m satisfies
#     exp(clip(m)) ≤ r, clip(m) < 69 < _CLIP_HI ⇒ NO row hit the upper
#     clip: the large side is exact.
#   * r ≥ e^-40 ⇒ N·exp(clip(m)) ≥ r ⇒ m ≥ -40 − ln N ≈ -48.3 (N=4096),
#     so the -80 floor's total contribution is ≤ N·e^(-80+48.3) ≈ 7e-11
#     relative — far below the bf16 cast noise (2⁻⁸) already present in
#     the probs on the fast path.
#   * NaN scores fail both comparisons → fallback → NaN propagates.
# Row sums stay finite on the speculative path: N·e^75 ≈ 1.5e36 < f32 max.
# Earlier variants were measured SLOWER: an unconditional max-subtract
# (+31%: exp then depends on a second full traversal) and a (QB, N) row-max
# acceptance reduce (+12%: one extra full-width pass). The row-sum check
# touches only the free (QB, 1) column.
_CLIP_LO, _CLIP_HI = -80.0, 75.0
_SAFE_LO, _SAFE_HI = -40.0, 69.0
_R_SAFE_LO, _R_SAFE_HI = math.exp(_SAFE_LO), math.exp(_SAFE_HI)


def _fwd_kernel(q_ref, kt_ref, vta_ref, o_ref, *, scale: float):
    """softmax(q·kᵀ·scale)·v — exact for any logits, ONE VPU pass in practice.

    The naive jax.nn.softmax costs 5 elementwise/reduce passes over the
    (QB, N) scores; at N=4096 the VPU — not the MXU — dominates the kernel
    (measured: K≤256 matmuls are equally fast on the MXU, so the d=16
    contraction is not the constraint; each extra full-width traversal of
    the scores costs ~25-30% kernel time). Design:

      * OPTIMISTIC single pass: exp(clip(u, -80, 75)) fused with scale and
        the bf16 cast — ONE traversal of the scores, then straight into the
        P·V matmul. An unconditional max-subtract variant was measured +31%
        kernel time (the max forces a SECOND traversal because exp then
        depends on it); a (QB, N) row-max acceptance reduce was +12%.
      * the row denominator rides the P·V matmul FOR FREE: `vta` carries an
        appended ones row, so the (QB, d+1) product's last column is
        rowsum(P̃). The MXU output tile is lane-padded d→128 regardless, so
        the extra column costs zero tile passes — unlike a SEPARATE ones-
        matmul (measured slower: full-depth contraction for 1 useful lane).
      * acceptance is decided on that free (QB, 1) denominator column
        (see the _SAFE window proof above): inside the window the clipped
        exp is provably undistorted. Only then is the speculative output
        committed.
      * EXACT FALLBACK: otherwise the block recomputes exp(u − rowmax) and
        its matmul. Softmax is shift-invariant, so the result is exact for
        ANY logit magnitude, and the fallback denominator lies in [1, N]:
        overflow and 0/0 NaNs are impossible on either path. Realistic
        (LayerNorm'd) attention never triggers the fallback; adversarial /
        large-logit inputs get exactness instead of the silent flattening
        of the earlier ±60-clamp kernel.
      * normalization lands on the (QB, d) OUTPUT — P·V/r ≡ (P/r)·V by
        linearity — 128-256× smaller than the (QB, N) probs.
    """
    d = vta_ref.shape[1] - 1
    q = q_ref[0]           # (QB, d) — input dtype straight to the MXU
    k_t = kt_ref[0]        # (d, N)
    scores = jnp.dot(q, k_t, preferred_element_type=jnp.float32)  # (QB, N) f32
    u = scores * scale
    # speculative probs — the only full-width VPU pass on the fast path
    probs = jnp.exp(jnp.clip(u, _CLIP_LO, _CLIP_HI)).astype(vta_ref.dtype)
    out_r = jax.lax.dot_general(          # P·V and the denominator, one pass
        probs, vta_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    denom = out_r[:, d:]                  # (QB, 1) rowsum(P̃), free
    ok = jnp.all((denom >= _R_SAFE_LO) & (denom <= _R_SAFE_HI))

    @pl.when(ok)
    def _():
        o_ref[0, :, :] = (out_r[:, :d] / denom).astype(o_ref.dtype)

    @pl.when(jnp.logical_not(ok))
    def _():
        # self-contained: recompute the scores instead of keeping `u` live
        # across the branch — the fallback is ~never taken, and this keeps
        # the fast path's VMEM high-water mark at ONE (QB, N) f32 tensor,
        # which is what lets q_block=512 compile at N=4096
        u2 = jnp.dot(q, k_t, preferred_element_type=jnp.float32) * scale
        rmax = jnp.max(u2, axis=-1, keepdims=True)
        exact = jnp.exp(jnp.maximum(u2 - rmax, _CLIP_LO)).astype(vta_ref.dtype)
        out_e = jax.lax.dot_general(
            exact, vta_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, :] = (out_e[:, :d] / out_e[:, d:]).astype(o_ref.dtype)


def _bwd_kernel(q_ref, kt_ref, vt_ref, do_ref, dq_ref, dkt_ref, dvt_ref,
                pt_ref, rs_ref, *, scale: float):
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

    # Same optimistic softmax as the forward (see _fwd_kernel): speculative
    # clipped exp with the denominator reduce fused into the same traversal
    # (the backward needs r anyway — here it doubles as the acceptance
    # check), exact max-subtracted recompute into the pt/rs VMEM scratches
    # only when a row sum leaves the safe window. The shift cancels in
    # every gradient term (softmax is shift-invariant), so this backward is
    # the EXACT softmax VJP on either path. P = p̃/r with p̃ unnormalized;
    # all P-sized (QB, N) elementwise work below is 3 fused passes total,
    # every 1/r normalization folded into a (QB, ·)-sized operand instead.
    scores = jnp.dot(q, k_t, preferred_element_type=jnp.float32)
    u = scores * scale
    spec = jnp.exp(jnp.clip(u, _CLIP_LO, _CLIP_HI)).astype(q.dtype)
    r_spec = jnp.sum(spec.astype(jnp.float32), axis=-1, keepdims=True)  # pass 1
    pt_ref[...] = spec
    rs_ref[...] = r_spec
    ok = jnp.all((r_spec >= _R_SAFE_LO) & (r_spec <= _R_SAFE_HI))

    @pl.when(jnp.logical_not(ok))
    def _():
        rmax = jnp.max(u, axis=-1, keepdims=True)
        exact = jnp.exp(jnp.maximum(u - rmax, _CLIP_LO)).astype(q.dtype)
        pt_ref[...] = exact
        rs_ref[...] = jnp.sum(exact.astype(jnp.float32), axis=-1, keepdims=True)

    pt = pt_ref[...]
    rinv = 1.0 / rs_ref[...]                                          # (QB, 1)

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
    # append a ones row to Vᵀ: the P·V matmul then also emits rowsum(P̃)
    # (the softmax denominator) in its lane-padded output tile — see
    # _fwd_kernel for why this is free
    vta = jnp.concatenate([vt, jnp.ones((bh, 1, n), vt.dtype)], axis=1)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh, n_qb),
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d + 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), qf.dtype),
        compiler_params=pltpu.CompilerParams(
            # 32 MB (v5e VMEM is 128 MB/core): the exact-fallback branch's
            # (QB, N) f32 tensors are not allocation-shared with the fast
            # path's, so q_block=512 at N=4096 needs headroom past the 14 MB
            # that the fast path alone would use
            vmem_limit_bytes=32 * 1024 * 1024,
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
    )(qf, kt, vta)


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
        # p̃ and row-sum scratches: written by the speculative pass,
        # conditionally overwritten by the exact fallback (see _bwd_kernel)
        scratch_shapes=[pltpu.VMEM((qb, n), qf.dtype),
                        pltpu.VMEM((qb, 1), jnp.float32)],
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
    (tools/attn_microbench.py on v5e, 50-iter medians at sampling batch 54):
    512 everywhere it divides — big blocks amortize the per-block K/V
    revisit (N=4096: 13.6/12.3/11.8 ms for qb 128/256/512; N=1024:
    2.2/1.7/1.6) — else the whole sequence for short ones (N=256: one
    256-row block is 1.6× faster than two 128s).
    """
    b, h, n, d = q.shape
    if q_block is None:
        if n >= 1024 and n % 512 == 0:
            q_block = 512
        elif n % 256 == 0:
            q_block = min(n, 256)
        else:
            q_block = min(n, 128)
    if n % q_block:
        raise ValueError(f"sequence length {n} not divisible by q_block {q_block}; "
                         "pad the token axis (the kernel grid would drop trailing tokens)")
    bh = b * h
    qf = q.reshape(bh, n, d)
    kt = k.reshape(bh, n, d).swapaxes(1, 2)  # (BH, d, N): token axis in lanes
    vt = v.reshape(bh, n, d).swapaxes(1, 2)
    out = _attention_flat(qf, kt, vt, q_block, interpret)
    return out.reshape(b, h, n, d)
