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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _kernel_constants(cfg: SpectrogramConfig, freq_block: int):
    """Padded, window-folded DFT matrices and the padded mel filterbank."""
    window = melmath.hann_window(cfg.n_fft)
    wc, ws = melmath.dft_matrices(cfg.n_fft, window, dtype=np.float32)
    n_bins = cfg.n_bins
    f_pad = _round_up(n_bins, freq_block)
    wc = np.pad(wc, ((0, 0), (0, f_pad - n_bins)))
    ws = np.pad(ws, ((0, 0), (0, f_pad - n_bins)))

    fb = melmath.mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    m_pad = _round_up(cfg.n_mels, _LANE)
    fb_t = np.pad(fb.T, ((0, f_pad - n_bins), (0, m_pad - cfg.n_mels)))  # (f_pad, m_pad)
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

    wc, ws, fb_t = _kernel_constants(cfg, freq_block)
    f_pad = wc.shape[1]
    m_pad = fb_t.shape[1]
    n_fblocks = f_pad // freq_block

    precision = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    out = pl.pallas_call(
        functools.partial(_mel_kernel, span=span, hop=hop, t_pad=t_pad, tail=tail, precision=precision),
        grid=(b, n_fblocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cfg.n_fft, freq_block), lambda i, f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, freq_block), lambda i, f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((freq_block, m_pad), lambda i, f: (f, 0), memory_space=pltpu.VMEM),
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
