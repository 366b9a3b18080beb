"""CLAP audio tower (HTSAT Swin-transformer) in flax — the reference's
FAD embedder, TPU-native.

The reference scores FAD with laion-clap's "630k-audioset" audio encoder at
48 kHz (reference fad.py:11-21, enable_fusion=False). That model is the
HTSAT-tiny Swin transformer + a 2-layer projection head; HuggingFace
transformers ships the canonical port (transformers.models.clap.modeling_clap,
"laion/clap-htsat-unfused"). This module re-implements the UNFUSED audio
branch in flax/NHWC so CLAP embeddings (and therefore reference-comparable
CLAP-FAD) run on TPU:

  wav (48 kHz) → int16-quantize roundtrip → repeatpad to 10 s → log-mel
  (1024-pt STFT, hop 480, 64 Slaney mels, fmax 14 kHz, 10·log10) →
  BatchNorm over mel bins → bicubic time-resize to 1024 frames
  (align_corners) → 4-chunk freq-stack to 256×256 → patch embed 4×4 →
  Swin stages (2,2,6,2 / heads 4,8,16,32 / window 8, shifted) → LN →
  mean-pool → Linear→ReLU→Linear → 512-d embedding.

Weight conversion: tools/convert_clap.py maps a HF CLAP state_dict into this
tree. Golden-tested against the HF torch forward (random weights, tiny and
full configs) in tests/test_clap_golden.py.

Inference-only (FAD embedding); no dropout/droppath paths.
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spectrogramgenai_tpu.audio.mel import hann_window, mel_filterbank

CLAP_SAMPLE_RATE = 48000


@dataclasses.dataclass(frozen=True)
class ClapAudioTowerConfig:
    """Mirrors transformers.ClapAudioConfig (unfused fields only)."""

    num_mel_bins: int = 64
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    patch_embeds_hidden_size: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_attention_heads: tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    projection_dim: int = 512
    # mel frontend (ClapFeatureExtractor defaults @48 kHz)
    sampling_rate: int = CLAP_SAMPLE_RATE
    fft_window_size: int = 1024
    hop_length: int = 480
    max_length_s: int = 10
    frequency_min: float = 0.0
    frequency_max: float = 14000.0

    @property
    def hidden_size(self) -> int:  # final Swin width
        return self.patch_embeds_hidden_size * 2 ** (len(self.depths) - 1)

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins


# ---------------------------------------------------------------------------
# Mel frontend (ClapFeatureExtractor parity, "rand_trunc"/repeatpad path)
# ---------------------------------------------------------------------------


def quantize_int16(wav: np.ndarray) -> np.ndarray:
    """float32→int16→float32 roundtrip — frechet_audio_distance feeds CLAP
    quantized audio, so parity requires it."""
    as_int = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    return (as_int / 32767.0).astype(np.float32)


def repeatpad(wav: np.ndarray, max_samples: int) -> np.ndarray:
    """ClapFeatureExtractor 'repeatpad': tile whole copies, zero-pad the rest;
    longer clips are truncated to max_samples (deterministic head crop — the
    HF extractor random-crops; for FAD determinism we take the head)."""
    if len(wav) >= max_samples:
        return wav[:max_samples]
    n_repeat = max(1, int(max_samples / len(wav)))
    wav = np.tile(wav, n_repeat)
    return np.pad(wav, (0, max_samples - len(wav)))


def clap_logmel(waveform: jax.Array, cfg: ClapAudioTowerConfig = ClapAudioTowerConfig()) -> jax.Array:
    """(B, n_samples) → (B, n_frames, n_mels) log-mel, HF spectrogram()
    semantics: center reflect pad, periodic Hann, power 2, Slaney mels
    (fmax 14 kHz), dB = 10·log10(max(mel, 1e-10)) with reference 1.0."""
    n_fft, hop = cfg.fft_window_size, cfg.hop_length
    window = jnp.asarray(hann_window(n_fft))
    pad = n_fft // 2
    x = jnp.pad(waveform, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[:, idx] * window  # (B, T, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)
    power = (spec.real**2 + spec.imag**2).astype(jnp.float32)
    fb = jnp.asarray(mel_filterbank(
        cfg.sampling_rate, n_fft, cfg.num_mel_bins,
        fmin=cfg.frequency_min, fmax=cfg.frequency_max, htk=False, norm="slaney",
    ))
    mel = jnp.einsum("btf,mf->btm", power, fb)
    return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


def clap_input_features(wavs: list[np.ndarray], cfg: ClapAudioTowerConfig = ClapAudioTowerConfig()):
    """Audio clips → (B, 1, n_frames, n_mels) model input (HF layout)."""
    max_samples = cfg.max_length_s * cfg.sampling_rate
    batch = np.stack([repeatpad(quantize_int16(np.asarray(w, np.float32)), max_samples)
                      for w in wavs])
    mel = clap_logmel(jnp.asarray(batch), cfg)
    return mel[:, None, :, :]


# ---------------------------------------------------------------------------
# torch-parity bicubic (align_corners=True) as a constant matrix
# ---------------------------------------------------------------------------


def _cubic_weight(t: float, a: float = -0.75) -> float:
    t = abs(t)
    if t <= 1.0:
        return (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0
    if t < 2.0:
        return a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a
    return 0.0


def bicubic_align_corners_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix replicating
    torch.nn.functional.interpolate(mode='bicubic', align_corners=True)
    along one axis (border taps clamped)."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1 or n_out == 1:
        m[:, 0] = 1.0
        return m
    for i in range(n_out):
        src = i * (n_in - 1) / (n_out - 1)
        f = math.floor(src)
        t = src - f
        for k in range(-1, 3):
            m[i, min(max(f + k, 0), n_in - 1)] += _cubic_weight(k - t)
    return m


# ---------------------------------------------------------------------------
# Swin blocks
# ---------------------------------------------------------------------------


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws², ws²)


def _shift_attn_mask(height: int, width: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, ws², ws²) additive mask (-100 across shifted regions)."""
    img = np.zeros((height, width))
    count = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wslice] = count
            count += 1
    windows = img.reshape(height // ws, ws, width // ws, ws).transpose(0, 2, 1, 3)
    windows = windows.reshape(-1, ws * ws)
    mask = windows[:, None, :] - windows[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    c = windows.shape[-1]
    x = windows.reshape(-1, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: np.ndarray | None):
        """x: (nW·B, ws², C); mask: (nW, ws², ws²) additive or None."""
        nwb, n, c = x.shape
        heads, hd = self.num_heads, self.dim // self.num_heads
        ws = self.window_size

        table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            ((2 * ws - 1) ** 2, heads),
        )
        rel_index = _relative_position_index(ws).reshape(-1)
        bias = table[rel_index].reshape(n, n, heads).transpose(2, 0, 1)  # (heads, n, n)

        def head_split(name):
            y = nn.Dense(self.dim, use_bias=self.qkv_bias, name=name)(x)
            return y.reshape(nwb, n, heads, hd).transpose(0, 2, 1, 3)

        q, k, v = head_split("query"), head_split("key"), head_split("value")
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        scores = scores + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            scores = scores.reshape(nwb // nw, nw, heads, n, n)
            scores = scores + jnp.asarray(mask)[None, :, None, :, :]
            scores = scores.reshape(nwb, heads, n, n)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(nwb, n, c)
        return nn.Dense(self.dim, name="out")(ctx)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    resolution: tuple[int, int]
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array):
        h, w = self.resolution
        ws, shift = self.window_size, self.shift_size
        # HF set_shift_and_window_size: window larger than the grid → no
        # partitioning (window=min(res)) and no shift.
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0
        assert h % ws == 0 and w % ws == 0, (h, w, ws)

        b, n, c = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=self.eps, name="layernorm_before")(x)
        y = y.reshape(b, h, w, c)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = _window_partition(y, ws)
        mask = _shift_attn_mask(h, w, ws, shift) if shift > 0 else None
        attn = WindowAttention(self.dim, self.num_heads, ws, self.qkv_bias,
                               name="attention")(windows, mask)
        y = _window_reverse(attn, ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y.reshape(b, n, c)

        z = nn.LayerNorm(epsilon=self.eps, name="layernorm_after")(x)
        z = nn.Dense(int(self.mlp_ratio * self.dim), name="intermediate")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim, name="output")(z)
        return x + z


class PatchMerging(nn.Module):
    dim: int
    resolution: tuple[int, int]
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array):
        h, w = self.resolution
        b, n, c = x.shape
        y = x.reshape(b, h, w, c)
        y = jnp.concatenate(
            [y[:, 0::2, 0::2], y[:, 1::2, 0::2], y[:, 0::2, 1::2], y[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(b, (h // 2) * (w // 2), 4 * c)
        y = nn.LayerNorm(epsilon=self.eps, name="norm")(y)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(y)


class ClapAudioTower(nn.Module):
    """HTSAT audio encoder + projection → 512-d CLAP audio embedding.

    Input: (B, 1, n_frames, n_mels) log-mel features (HF ClapAudioModel
    layout). Output: (B, projection_dim) embeddings (NOT L2-normalized —
    frechet_audio_distance normalizes before scoring; fad CLI does the same).
    """

    cfg: ClapAudioTowerConfig = ClapAudioTowerConfig()

    @nn.compact
    def __call__(self, input_features: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, ch, t, f = input_features.shape
        assert ch == 1 and f == cfg.num_mel_bins, (input_features.shape,)

        # BatchNorm over mel bins (running stats; HF transposes C↔F first)
        x = input_features.transpose(0, 2, 3, 1)  # (B, T, F, 1) — any layout
        x = x[..., 0]                             # (B, T, F): feature axis = mel
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="batch_norm")(x)

        # reshape_mel2img: bicubic time-resize to spec_width, then stack
        # freq_ratio time-chunks along the freq axis → (spec_size, spec_size)
        spec_width = cfg.spec_size * cfg.freq_ratio      # 1024
        spec_height = cfg.spec_size // cfg.freq_ratio    # 64
        assert t <= spec_width and f <= spec_height, (t, f)
        if t < spec_width:
            m = jnp.asarray(bicubic_align_corners_matrix(t, spec_width))
            x = jnp.einsum("Tt,btf->bTf", m, x)
        if f < spec_height:
            m = jnp.asarray(bicubic_align_corners_matrix(f, spec_height))
            x = jnp.einsum("Ff,btf->btF", m, x)
        # (B, freq_ratio, spec_size, spec_height) → stack chunks on freq
        x = x.reshape(b, cfg.freq_ratio, cfg.spec_size, spec_height)
        x = x.transpose(0, 1, 3, 2)                       # (B, r, F, T')
        x = x.reshape(b, cfg.freq_ratio * spec_height, cfg.spec_size)  # (B, H, W)

        # patch embed (NHWC conv) + LN, tokens in (H, W) row-major order
        x = x[..., None]
        x = nn.Conv(cfg.patch_embeds_hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_stride, padding=0, name="patch_embed_proj")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, cfg.patch_embeds_hidden_size)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="patch_embed_norm")(x)

        res = (gh, gw)
        dim = cfg.patch_embeds_hidden_size
        for i, depth in enumerate(cfg.depths):
            for j in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=cfg.num_attention_heads[i],
                    resolution=res,
                    window_size=cfg.window_size,
                    shift_size=0 if j % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio,
                    qkv_bias=cfg.qkv_bias,
                    eps=cfg.layer_norm_eps,
                    name=f"layers_{i}_blocks_{j}",
                )(x)
            if i < len(cfg.depths) - 1:
                x = PatchMerging(dim, res, eps=cfg.layer_norm_eps,
                                 name=f"layers_{i}_downsample")(x)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)
        # HF rearranges tokens into a freq-grouped 2D map then adaptive-avg
        # pools over ALL positions — identical to a plain token mean.
        latent = jnp.mean(x, axis=1)  # (B, hidden_size)

        y = nn.Dense(cfg.projection_dim, name="linear1")(latent)
        y = nn.relu(y)
        return nn.Dense(cfg.projection_dim, name="linear2")(y)


# ---------------------------------------------------------------------------
# embeddings entry point (fad.py "clap" mode)
# ---------------------------------------------------------------------------


def load_clap_params(ckpt_path: str, cfg: ClapAudioTowerConfig = ClapAudioTowerConfig()):
    """Load a converted CLAP checkpoint (tools/convert_clap.py msgpack)."""
    from flax import serialization

    model = ClapAudioTower(cfg)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, cfg.max_length_s * cfg.sampling_rate // cfg.hop_length + 1,
                   cfg.num_mel_bins)),
    )
    with open(ckpt_path, "rb") as f:
        return serialization.from_bytes(jax.device_get(template), f.read())


def clap_embeddings(wavs: list[np.ndarray], variables,
                    cfg: ClapAudioTowerConfig = ClapAudioTowerConfig(),
                    batch: int = 8, normalize: bool = True) -> np.ndarray:
    """Audio clips (48 kHz float arrays) → (N, 512) CLAP embeddings."""
    model = ClapAudioTower(cfg)
    apply = jax.jit(lambda feats: model.apply(variables, feats))
    out = []
    for i in range(0, len(wavs), batch):
        feats = clap_input_features(wavs[i : i + batch], cfg)
        emb = np.asarray(apply(feats))
        out.append(emb)
    emb = np.concatenate(out, axis=0)
    if normalize:  # laion-clap / frechet_audio_distance L2-normalize
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    return emb
