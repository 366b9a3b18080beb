"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: wav→mel-spectrogram preprocessing throughput (specs/sec) through
the fused Pallas kernel on the available accelerator, vs the CPU reference
pipeline (the same librosa-parity math in NumPy — the reference's own
compute path, measured in-process).

Secondary keys (same JSON object): DDPM latent sampling throughput
(samples/sec/chip at 256×256 output, full 999-step CFG chain + VQ decode).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _bench_mel(cfg, batch=256, iters=10):
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.spectrogram import logmel_spectrogram, reference_logmel_np
    from spectrogramgenai_tpu.ops.mel_kernel import fused_logmel

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    t = np.arange(cfg.clip_samples) / cfg.sample_rate
    audio = np.stack(
        [np.sin(2 * np.pi * (800 + 37 * k) * t) * np.exp(-0.3 * t) for k in range(batch)]
    ).astype(np.float32)
    audio += 0.05 * rng.standard_normal(audio.shape).astype(np.float32)
    xa = jnp.asarray(audio)

    from spectrogramgenai_tpu.utils.benchtools import timeit_device

    fn = (lambda x: fused_logmel(x, cfg)) if on_tpu else (lambda x: logmel_spectrogram(x, cfg))
    dt = timeit_device(fn, xa, iters=iters)
    dev_specs_per_sec = batch / dt

    # CPU reference: identical math (librosa-parity), NumPy/pocketfft.
    # Best-of-N single-clip timings: robust to transient machine load and
    # conservative for the speedup ratio (fastest CPU = hardest baseline).
    per_clip = []
    for i in range(6):
        t0 = time.perf_counter()
        reference_logmel_np(audio[i], cfg)
        per_clip.append(time.perf_counter() - t0)
    cpu_specs_per_sec = 1.0 / min(per_clip)

    # Parity check rides along so the number is honest.
    got = np.asarray(fn(xa[:2]))
    ref = np.stack([reference_logmel_np(audio[i], cfg) for i in range(2)])
    max_err_db = float(np.abs(got - ref).max())

    return dev_specs_per_sec, cpu_specs_per_sec, max_err_db


def _bench_ddpm_sampler(num_classes=27):
    """Full 999-step latent CFG chain + quantize/decode → 256×256 uint8."""
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.config import DDPMConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.models.vqvae import VQVAE
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask

    cfg = DDPMConfig(img_size=256, latent=True, num_classes=num_classes, run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    vq = VQVAE(latent_dim=cfg.latent_dim, dtype=jnp.bfloat16)
    vq_vars = vq.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 256, 256, 1)))
    task = DiffusionTask(cfg, mesh, total_steps=100, vq_variables=vq_vars)
    state = task.init_state(0)

    from spectrogramgenai_tpu.utils.benchtools import device_sync

    labels = jnp.arange(num_classes, dtype=jnp.int32)
    sampler = task.make_sampler()
    # first call = compile + warmup (the 999-step scan body compiles once)
    imgs = sampler(state.params, jax.random.PRNGKey(0), labels, cfg_scale=cfg.cfg_scale)
    device_sync(imgs)
    assert imgs.shape == (num_classes, 256, 256, 1) and imgs.dtype == jnp.uint8

    t0 = time.perf_counter()
    imgs = sampler(state.params, jax.random.PRNGKey(1), labels, cfg_scale=cfg.cfg_scale)
    device_sync(imgs)
    dt = time.perf_counter() - t0

    # DDIM fast sampler (50 steps) — capability beyond the reference
    imgs = sampler(state.params, jax.random.PRNGKey(2), labels, cfg_scale=cfg.cfg_scale,
                   sampler="ddim", num_steps=50)
    device_sync(imgs)
    t0 = time.perf_counter()
    imgs = sampler(state.params, jax.random.PRNGKey(3), labels, cfg_scale=cfg.cfg_scale,
                   sampler="ddim", num_steps=50)
    device_sync(imgs)
    ddim_sps = num_classes / (time.perf_counter() - t0)

    # training throughput at the reference per-device batch (train_ddpm.py:31)
    step = task.make_train_step()
    timgs = jnp.zeros((10, 256, 256, 1), jnp.float32)
    tlabs = jnp.zeros((10,), jnp.int32)
    state, m = step(state, timgs, tlabs)
    device_sync(m)
    t0 = time.perf_counter()
    for _ in range(5):
        state, m = step(state, timgs, tlabs)
    device_sync(m)
    train_dt = (time.perf_counter() - t0) / 5
    return num_classes / dt, dt, 10 / train_dt, ddim_sps


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig

    import sys

    cfg = SpectrogramConfig(sample_rate=22050)
    print("bench: mel…", file=sys.stderr, flush=True)
    dev_sps, cpu_sps, max_err_db = _bench_mel(cfg)
    print(f"bench: mel done ({dev_sps:.0f}/s); ddpm…", file=sys.stderr, flush=True)

    try:
        ddpm_sps, ddpm_chain_s, train_ips, ddim_sps = _bench_ddpm_sampler()
    except Exception:  # keep the headline metric robust
        ddpm_sps, ddpm_chain_s, train_ips, ddim_sps = None, None, None, None
    print("bench: ddpm done", file=sys.stderr, flush=True)

    result = {
        "metric": "wav->mel 256x256 log-mel specs/sec (fused Pallas, 1 chip)",
        "value": round(dev_sps, 1),
        "unit": "specs/sec",
        "vs_baseline": round(dev_sps / cpu_sps, 1),
        "cpu_reference_specs_per_sec": round(cpu_sps, 2),
        "mel_parity_max_err_db": round(max_err_db, 6),
        "ddpm_sampling_samples_per_sec_per_chip": None if ddpm_sps is None else round(ddpm_sps, 3),
        "ddpm_999step_cfg_chain_seconds_batch27": None if ddpm_chain_s is None else round(ddpm_chain_s, 2),
        "ddpm_train_images_per_sec_per_chip_batch10": None if train_ips is None else round(train_ips, 1),
        "ddim50_sampling_samples_per_sec_per_chip": None if ddim_sps is None else round(ddim_sps, 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
