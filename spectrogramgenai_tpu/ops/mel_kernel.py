"""Fused Pallas TPU kernel: wav → mel power spectrogram on the MXU.

Replaces the reference's librosa CPU path (reference src/helpers.py:88-92,
src/gen_specs.py) with a single fused kernel:

    framing → Hann window → real DFT → |·|² → mel filterbank

The framing is folded into the DFT matmul algebraically: with hop h and
frame length n_fft, frame f is the concatenation of ``span = ceil(n_fft/h)``
consecutive hop-rows of the signal, so

    frames @ W  ==  Σ_q  rows[f0+q : f0+q+T] @ W[q·h : (q+1)·h]

i.e. `span` shifted row-block matmuls — no gather, no overlapping copies,
pure MXU work. The Hann window is pre-multiplied into the DFT matrices
(audio/mel.py:dft_matrices).

Grid: ``(batch, num_freq_blocks)``. Each batch step DMAs that clip's hop-rows
into VMEM once (on the first freq block), then accumulates
``power(freq_block) @ melᵀ(freq_block)`` into the output block, which Pallas
keeps resident in VMEM across the inner freq grid.

The data-dependent ``power_to_db(ref=max)`` stays in XLA (a cheap fused
reduction) — see :func:`fused_logmel`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectrogramgenai_tpu.audio import mel as melmath
from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig, power_to_db

_LANE = 128

# `exact` levels for the DFT/mel matmuls (static arg, so bool stays valid):
#   True  → HIGHEST: 6-pass bf16 (f32-exact), the bit-parity default
#   "high"→ hand-rolled 3-pass bf16 (bf16_3x): operands split into bf16
#           hi/lo halves, a·b ≈ a_hi·b_hi + a_hi·b_lo + a_lo·b_hi (the
#           2^-16-relative lo·lo term dropped). Mosaic's dot lowering
#           rejects lax.Precision.HIGH, so the splits are explicit: W
#           matrices pre-split host-side (two bf16 halves = the same VMEM
#           bytes as one f32), row blocks split in-kernel (cheap VPU).
#   False → DEFAULT: 1-pass bf16, fastest, dB-scale error at quiet bins
_PRECISION = {
    True: jax.lax.Precision.HIGHEST,
    False: jax.lax.Precision.DEFAULT,
}


def _split_bf16(a: np.ndarray) -> np.ndarray:
    """(…, K, N) f32 → (…, 2K, N) bf16: rows [hi; lo], a ≈ hi + lo."""
    import ml_dtypes

    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.concatenate([hi, lo], axis=-2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _kernel_constants(cfg: SpectrogramConfig, freq_block: int, split: bool = False):
    """Padded, window-folded DFT matrices and the padded mel filterbank.

    split=True ("high" mode): DFT matrices come back as (2·n_fft, FB) bf16
    stacks [hi; lo] and the filterbank as an (f_pad, 2·m_pad) bf16 stack
    [hi | lo] — same VMEM bytes as the f32 originals.
    """
    window = melmath.hann_window(cfg.n_fft)
    wc, ws = melmath.dft_matrices(cfg.n_fft, window, dtype=np.float32)
    n_bins = cfg.n_bins
    f_pad = _round_up(n_bins, freq_block)
    wc = np.pad(wc, ((0, 0), (0, f_pad - n_bins)))
    ws = np.pad(ws, ((0, 0), (0, f_pad - n_bins)))

    fb = melmath.mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    m_pad = _round_up(cfg.n_mels, _LANE)
    fb_t = np.pad(fb.T, ((0, f_pad - n_bins), (0, m_pad - cfg.n_mels)))  # (f_pad, m_pad)
    if split:
        wc, ws = _split_bf16(wc), _split_bf16(ws)                 # (2·n_fft, f_pad)
        fb_t = np.concatenate(np.split(_split_bf16(fb_t), 2, axis=0), axis=1)  # (f_pad, 2·m_pad)
    return wc, ws, fb_t


def _mel_kernel(rows_hbm, wc_ref, ws_ref, fbt_ref, out_ref, rows_vmem, sem, *, span, hop, t_pad, tail,
                precision):
    """One (batch, freq_block) grid step.

    rows_hbm:  (1, n_rows, hop) in ANY/HBM — whole clip's hop-rows.
    wc_ref/ws_ref: (n_fft, FB) window-folded DFT block in VMEM.
    fbt_ref:   (FB, M) mel filterbank block in VMEM.
    out_ref:   (t_pad, M) mel power output block (accumulated over freq grid).
    rows_vmem: (n_rows, hop) scratch — persists across the inner freq grid.
    """
    i = pl.program_id(0)
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _load_rows():
        dma = pltpu.make_async_copy(rows_hbm.at[i], rows_vmem, sem)
        dma.start()
        dma.wait()

    # frames @ W == Σ_q rows[q : q+t_pad] @ W[q*hop : q*hop + width]
    freq_block = wc_ref.shape[1]
    re = jnp.zeros((t_pad, freq_block), jnp.float32)
    im = jnp.zeros((t_pad, freq_block), jnp.float32)
    # exact mode → HIGHEST precision: the DFT sums cancel heavily at quiet
    # bins, so default bf16 MXU passes leave dB-scale errors after the log.
    # fast mode (precision=DEFAULT) measures ~1.7× faster with ≤~2.5 dB error
    # at the quietest (≤−50 dB) bins — fine for augmentation-scale preprocessing.
    for q in range(span):
        width = hop if q < span - 1 else tail
        r_q = rows_vmem[pl.ds(q, t_pad), :width]
        re = re + jnp.dot(
            r_q, wc_ref[pl.ds(q * hop, width), :],
            preferred_element_type=jnp.float32, precision=precision,
        )
        im = im + jnp.dot(
            r_q, ws_ref[pl.ds(q * hop, width), :],
            preferred_element_type=jnp.float32, precision=precision,
        )

    power = re * re + im * im  # (t_pad, FB)
    partial = jnp.dot(
        power, fbt_ref[:, :], preferred_element_type=jnp.float32, precision=precision
    )

    @pl.when(f == 0)
    def _init():
        out_ref[0, :, :] = partial

    @pl.when(f > 0)
    def _acc():
        out_ref[0, :, :] = out_ref[0, :, :] + partial


def _mel_kernel_3pass(rows_hbm, wc_ref, ws_ref, fbt_ref, out_ref, rows_vmem, sem, *, span, hop,
                      t_pad, tail):
    """"high"-precision variant: every matmul is 3 single-pass bf16 products
    (bf16_3x, ~2^-16 relative error) instead of HIGHEST's 6 — see
    _PRECISION. W refs carry [hi; lo] stacked on the row axis (so chunk q's
    lo rows live at n_fft + q·hop); fbt carries [hi | lo] on the lane axis.
    Row blocks and the power matrix are split in-kernel (two cheap VPU ops
    on the small (t_pad, ·) operands)."""
    i = pl.program_id(0)
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _load_rows():
        dma = pltpu.make_async_copy(rows_hbm.at[i], rows_vmem, sem)
        dma.start()
        dma.wait()

    n_fft = wc_ref.shape[0] // 2
    freq_block = wc_ref.shape[1]
    re = jnp.zeros((t_pad, freq_block), jnp.float32)
    im = jnp.zeros((t_pad, freq_block), jnp.float32)
    for q in range(span):
        width = hop if q < span - 1 else tail
        r = rows_vmem[pl.ds(q, t_pad), :width]
        r_hi = r.astype(jnp.bfloat16)
        r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        for w_ref, acc in ((wc_ref, 0), (ws_ref, 1)):
            w_hi = w_ref[pl.ds(q * hop, width), :]
            w_lo = w_ref[pl.ds(n_fft + q * hop, width), :]
            part = (
                jnp.dot(r_hi, w_hi, preferred_element_type=jnp.float32)
                + jnp.dot(r_hi, w_lo, preferred_element_type=jnp.float32)
                + jnp.dot(r_lo, w_hi, preferred_element_type=jnp.float32)
            )
            if acc == 0:
                re = re + part
            else:
                im = im + part

    power = re * re + im * im  # (t_pad, FB) f32
    m_pad = fbt_ref.shape[1] // 2
    fb_hi = fbt_ref[:, :m_pad]
    fb_lo = fbt_ref[:, m_pad:]
    p_hi = power.astype(jnp.bfloat16)
    p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    partial = (
        jnp.dot(p_hi, fb_hi, preferred_element_type=jnp.float32)
        + jnp.dot(p_hi, fb_lo, preferred_element_type=jnp.float32)
        + jnp.dot(p_lo, fb_hi, preferred_element_type=jnp.float32)
    )

    @pl.when(f == 0)
    def _init():
        out_ref[0, :, :] = partial

    @pl.when(f > 0)
    def _acc():
        out_ref[0, :, :] = out_ref[0, :, :] + partial


@functools.partial(jax.jit, static_argnames=("cfg", "freq_block", "interpret", "exact"))
def fused_mel_power(audio: jax.Array, cfg: SpectrogramConfig, freq_block: int = 256, interpret: bool = False,
                    exact: bool = True):
    """(B, N) audio → (B, T, n_mels) mel power spectrogram via the fused kernel.

    T = cfg.frames_for(N) real frames (un-padded view of the padded kernel
    output). Use :func:`fused_logmel` for the full dB pipeline.
    """
    b, n = audio.shape
    hop = cfg.hop_length
    span = -(-cfg.n_fft // hop)
    tail = cfg.n_fft - (span - 1) * hop

    pad = cfg.n_fft // 2 if cfg.center else 0
    t_real = cfg.frames_for(n)
    t_pad = _round_up(t_real, 8)

    n_rows = _round_up(t_pad - 1 + span, 8)  # sublane-aligned for the VMEM DMA
    total = n + 2 * pad
    x = jnp.pad(audio, ((0, 0), (pad, max(0, n_rows * hop - total) + pad)))
    rows = x[:, : n_rows * hop].reshape(b, n_rows, hop)

    split = exact == "high"
    wc, ws, fb_t = _kernel_constants(cfg, freq_block, split=split)
    f_pad = wc.shape[1]
    m_pad = fb_t.shape[1] // (2 if split else 1)
    n_fblocks = f_pad // freq_block

    if split:
        kernel = functools.partial(_mel_kernel_3pass, span=span, hop=hop, t_pad=t_pad, tail=tail)
    else:
        kernel = functools.partial(_mel_kernel, span=span, hop=hop, t_pad=t_pad, tail=tail,
                                   precision=_PRECISION[exact])
    w_rows = 2 * cfg.n_fft if split else cfg.n_fft
    out = pl.pallas_call(
        kernel,
        grid=(b, n_fblocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((w_rows, freq_block), lambda i, f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_rows, freq_block), lambda i, f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((freq_block, fb_t.shape[1]), lambda i, f: (f, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, m_pad), lambda i, f: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, m_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_rows, hop), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # batch steps are independent (per-clip scratch reloads at f==0);
            # the freq dimension accumulates into the output → sequential.
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t_pad * cfg.n_fft * f_pad + 2 * b * t_pad * f_pad * m_pad,
            bytes_accessed=4 * (b * n_rows * hop + 2 * cfg.n_fft * f_pad + f_pad * m_pad + b * t_pad * m_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows, jnp.asarray(wc), jnp.asarray(ws), jnp.asarray(fb_t))

    return out[:, :t_real, : cfg.n_mels]


@functools.partial(jax.jit, static_argnames=("cfg", "freq_block", "interpret", "exact"))
def fused_logmel(audio: jax.Array, cfg: SpectrogramConfig, freq_block: int = 256, interpret: bool = False,
                 exact: bool = True):
    """Full reference-parity pipeline on TPU: (B, N) → (B, n_mels, num_frames) dB.

    Kernel produces mel power; the per-sample ``ref=max`` dB conversion and the
    trailing time crop (reference helpers.py:92 order) run in fused XLA ops.
    """
    mel = fused_mel_power(audio, cfg, freq_block=freq_block, interpret=interpret, exact=exact)  # (B, T, M)
    mel = jnp.swapaxes(mel, 1, 2)  # (B, M, T)
    db = power_to_db(mel, amin=cfg.amin, top_db=cfg.top_db)
    return db[..., : cfg.num_frames]
