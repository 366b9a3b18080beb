"""CPU reference baseline for DDPM sampling, in PyTorch.

Implements the reference's latent-diffusion sampling workload (the 999-step
classifier-free-guidance reverse chain of ddpm_conditional_generate.py →
diff_modules.py:630-707, two UNet forwards per step on 4×64×64 latents,
ending with codebook quantize + VQ decode) as an independent torch/CPU
program, so ``bench.py`` can report a *measured* samples/sec CPU baseline
instead of an asserted one.

This is NOT a copy of the reference code: it is a fresh torch implementation
of the same architecture (diff_modules.py:52-217 layer plan — DoubleConv /
Down / Up / 4-head SelfAttention, 64-128-256-256 encoder, 512-512-256
bottleneck, sinusoidal 256-d time embedding + class embedding) used purely
as a FLOP-equivalent baseline. Weights are random — throughput does not
depend on their values.
"""

from __future__ import annotations

import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class _DoubleConv(nn.Module):
    def __init__(self, c_in: int, c_out: int, mid: int | None = None, residual: bool = False):
        super().__init__()
        mid = mid or c_out
        self.residual = residual
        self.block = nn.Sequential(
            nn.Conv2d(c_in, mid, 3, padding=1, bias=False),
            nn.GroupNorm(1, mid),
            nn.GELU(),
            nn.Conv2d(mid, c_out, 3, padding=1, bias=False),
            nn.GroupNorm(1, c_out),
        )

    def forward(self, x):
        if self.residual:
            return F.gelu(x + self.block(x))
        return self.block(x)


class _Down(nn.Module):
    def __init__(self, c_in: int, c_out: int, emb_dim: int = 256):
        super().__init__()
        self.net = nn.Sequential(
            nn.MaxPool2d(2),
            _DoubleConv(c_in, c_in, residual=True),
            _DoubleConv(c_in, c_out),
        )
        self.emb = nn.Sequential(nn.SiLU(), nn.Linear(emb_dim, c_out))

    def forward(self, x, t):
        x = self.net(x)
        return x + self.emb(t)[:, :, None, None]


class _Up(nn.Module):
    def __init__(self, c_in: int, c_out: int, emb_dim: int = 256):
        super().__init__()
        self.up = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
        self.net = nn.Sequential(
            _DoubleConv(c_in, c_in, residual=True),
            _DoubleConv(c_in, c_out, mid=c_in // 2),
        )
        self.emb = nn.Sequential(nn.SiLU(), nn.Linear(emb_dim, c_out))

    def forward(self, x, skip, t):
        x = self.up(x)
        x = torch.cat([skip, x], dim=1)
        x = self.net(x)
        return x + self.emb(t)[:, :, None, None]


class _SelfAttention(nn.Module):
    def __init__(self, channels: int):
        super().__init__()
        self.channels = channels
        self.mha = nn.MultiheadAttention(channels, 4, batch_first=True)
        self.ln = nn.LayerNorm([channels])
        self.ff = nn.Sequential(
            nn.LayerNorm([channels]),
            nn.Linear(channels, channels),
            nn.GELU(),
            nn.Linear(channels, channels),
        )

    def forward(self, x):
        b, c, h, w = x.shape
        tokens = x.flatten(2).transpose(1, 2)
        normed = self.ln(tokens)
        att, _ = self.mha(normed, normed, normed)
        tokens = att + tokens
        tokens = self.ff(tokens) + tokens
        return tokens.transpose(1, 2).reshape(b, c, h, w)


class _CondUNet(nn.Module):
    """Reference UNet_conditional channel plan at latent resolution."""

    def __init__(self, c_in: int = 4, c_out: int = 4, time_dim: int = 256, num_classes: int = 27):
        super().__init__()
        self.time_dim = time_dim
        self.inc = _DoubleConv(c_in, 64)
        self.down1, self.sa1 = _Down(64, 128), _SelfAttention(128)
        self.down2, self.sa2 = _Down(128, 256), _SelfAttention(256)
        self.down3, self.sa3 = _Down(256, 256), _SelfAttention(256)
        self.bot1 = _DoubleConv(256, 512)
        self.bot2 = _DoubleConv(512, 512)
        self.bot3 = _DoubleConv(512, 256)
        self.up1, self.sa4 = _Up(512, 128), _SelfAttention(128)
        self.up2, self.sa5 = _Up(256, 64), _SelfAttention(64)
        self.up3, self.sa6 = _Up(128, 64), _SelfAttention(64)
        self.outc = nn.Conv2d(64, c_out, 1)
        self.label_emb = nn.Embedding(num_classes, time_dim)

    def _time_embedding(self, t: torch.Tensor) -> torch.Tensor:
        half = self.time_dim // 2
        freqs = 1.0 / (10000 ** (torch.arange(0, half, dtype=torch.float32) / half))
        ang = t[:, None].float() * freqs[None]
        return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)

    def forward(self, x, t, y=None):
        emb = self._time_embedding(t)
        if y is not None:
            emb = emb + self.label_emb(y)
        x1 = self.inc(x)
        x2 = self.sa1(self.down1(x1, emb))
        x3 = self.sa2(self.down2(x2, emb))
        x4 = self.sa3(self.down3(x3, emb))
        x4 = self.bot3(self.bot2(self.bot1(x4)))
        x = self.sa4(self.up1(x4, x3, emb))
        x = self.sa5(self.up2(x, x2, emb))
        x = self.sa6(self.up3(x, x1, emb))
        return self.outc(x)


class _VQDecoder(nn.Module):
    """Reference VQ-VAE decode path (diff_modules.py:322-352): two stride-2
    transposed convs back to 256×256 after the residual stack."""

    def __init__(self, latent_dim: int = 4, hidden: int = 512):
        super().__init__()
        self.proj = nn.Conv2d(latent_dim, hidden, 1)
        self.res1 = nn.Conv2d(hidden, hidden, 3, padding=1)
        self.res2 = nn.Conv2d(hidden, hidden, 1)
        self.up1 = nn.ConvTranspose2d(hidden, hidden // 2, 2, stride=2)
        self.up2 = nn.ConvTranspose2d(hidden // 2, 1, 2, stride=2)

    def forward(self, z):
        h = self.proj(z)
        h = h + self.res2(F.relu(self.res1(F.relu(h))))
        return self.up2(F.relu(self.up1(h)))


@torch.inference_mode()
def measure_sampling_baseline(
    batch: int = 27,
    noise_steps: int = 1000,
    cfg_scale: float = 3.0,
    timed_steps: int = 1,
    measure_batch: int = 3,
    latent_size: int = 64,
) -> dict:
    """Time reverse-chain steps of the reference workload on CPU at a small
    batch and extrapolate (per-image, then ×batch ×(noise_steps−1)) to the
    full chain — a full batch-27 999-step chain takes hours on this 1-core
    machine, and CPU step time is measured linear in batch (1.12 s at b=1,
    4.26 s at b=4), so per-image extrapolation is faithful and slightly
    conservative (per-image time falls a few % at larger batch, making the
    extrapolated baseline marginally FASTER than reality → a harder target).

    Returns {"samples_per_sec", "chain_seconds", "step_seconds", "batch",
    "measured_batch", "torch_threads"}.
    """
    torch.manual_seed(0)
    model = _CondUNet().eval()
    decoder = _VQDecoder().eval()

    beta = torch.linspace(1e-4, 0.02, noise_steps)
    alpha = 1.0 - beta
    alpha_hat = torch.cumprod(alpha, dim=0)

    mb = measure_batch
    x = torch.randn(mb, 4, latent_size, latent_size)
    labels = torch.arange(mb, dtype=torch.long) % 27

    def chain_step(x, i: int):
        t = torch.full((mb,), i, dtype=torch.long)
        cond = model(x, t, labels)
        uncond = model(x, t, None)
        pred = torch.lerp(uncond, cond, cfg_scale)
        a, ah, b = alpha[i], alpha_hat[i], beta[i]
        noise = torch.randn_like(x) if i > 1 else torch.zeros_like(x)
        return (
            1.0 / torch.sqrt(a) * (x - ((1 - a) / torch.sqrt(1 - ah)) * pred)
            + torch.sqrt(b) * noise
        )

    x = chain_step(x, noise_steps - 1)  # warmup (allocators, thread pool)
    # best-of-N single steps: robust to transient machine load and
    # conservative for the speedup ratio (fastest CPU = hardest baseline)
    per_step = []
    for k in range(max(timed_steps, 3)):
        t0 = time.perf_counter()
        x = chain_step(x, noise_steps - 2 - k)
        per_step.append(time.perf_counter() - t0)
    measured_step = min(per_step)
    step_seconds = measured_step / mb * batch  # linear-in-batch extrapolation

    t0 = time.perf_counter()
    decoder(x)
    decode_seconds = (time.perf_counter() - t0) / mb * batch

    chain_seconds = step_seconds * (noise_steps - 1) + decode_seconds
    return {
        "samples_per_sec": batch / chain_seconds,
        "chain_seconds": chain_seconds,
        "step_seconds": step_seconds,
        "batch": batch,
        "measured_batch": mb,
        "torch_threads": torch.get_num_threads(),
    }


if __name__ == "__main__":
    import json

    print(json.dumps(measure_sampling_baseline()))
