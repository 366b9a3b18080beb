"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: wav→mel-spectrogram preprocessing throughput (specs/sec) through
the fused Pallas kernel on the available accelerator, vs the CPU reference
pipeline (the same librosa-parity math in NumPy — the reference's own
compute path, measured in-process).

Secondary keys (same JSON object):
  * DDPM latent sampling throughput (samples/sec/chip at 256×256, full
    999-step CFG chain + VQ decode) plus a *measured* torch/CPU reference
    baseline for the same chain (tools/cpu_baseline_torch.py) and the
    resulting speedup — the BASELINE ≥20× contract.
  * FLOPs and MFU (vs v5e bf16 peak) for the sampler chain and train step,
    from XLA's compiled cost analysis.
  * Train-step throughput for the other BASELINE workloads: ACGAN,
    VQ-VAE, classifier.

Any failed section logs its traceback to stderr and lands in the JSON's
"errors" map — regressions cannot hide behind nulls.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12  # per chip


def _flops_of(jitted, *args, **kwargs):
    """Total FLOPs of the compiled program via XLA cost analysis (None if
    the backend doesn't expose it)."""
    try:
        analysis = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception:
        return None


def _mfu(flops, seconds):
    if flops is None or not seconds:
        return None
    import jax

    if jax.default_backend() != "tpu":
        return None
    return 100.0 * flops / seconds / V5E_BF16_PEAK_FLOPS


def _time_train_step(step, state, *args, iters=20):
    """Mean seconds/step of a jitted `(state, *args) → (state, metrics)` step
    (1 warmup call, then `iters` timed; device-synced — see CLAUDE.md on why
    block_until_ready is not enough through the axon tunnel).

    iters=20: the tunnel's host-transfer sync costs ~30 ms per round trip
    (measured; pipelined dispatch is ~1 ms), so the single end-of-loop sync
    adds 30/iters ms to every step — at 5 iters that inflated sub-10-ms
    steps by >50% and made small-model MFU numbers meaningless."""
    from spectrogramgenai_tpu.utils.benchtools import device_sync

    state, m = step(state, *args)
    device_sync(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, *args)
    device_sync(m)
    return (time.perf_counter() - t0) / iters


def _bench_mel(cfg, batch=256, iters=30):  # ≥20 iters/sync: CLAUDE.md timing rule
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

    extra = {}
    if on_tpu:
        # "high" mode: hand-rolled 3-pass bf16 matmuls (bf16_3x) — measured
        # ~3× the exact-mode throughput at ≲0.05 dB error, ~7× below the
        # 0.31 dB/level uint8-PNG quantization of the reference data path.
        fn_h = lambda x: fused_logmel(x, cfg, exact="high")  # noqa: E731
        dt_h = timeit_device(fn_h, xa, iters=iters)
        got_h = np.asarray(fn_h(xa[:2]))
        extra["mel_specs_per_sec_high_mode"] = batch / dt_h
        extra["mel_high_mode_max_err_db"] = float(np.abs(got_h - ref).max())

    return dev_specs_per_sec, cpu_specs_per_sec, max_err_db, extra


def _bench_ddpm(num_classes=27):
    """Full 999-step latent CFG chain + quantize/decode → 256×256 uint8,
    plus train-step throughput and compiled FLOPs/MFU for both."""
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.config import DDPMConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.models.vqvae import VQVAE
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask
    from spectrogramgenai_tpu.utils.benchtools import device_sync

    cfg = DDPMConfig(img_size=256, latent=True, num_classes=num_classes, run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    vq = VQVAE(latent_dim=cfg.latent_dim, dtype=jnp.bfloat16)
    vq_vars = vq.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 256, 256, 1)))
    task = DiffusionTask(cfg, mesh, total_steps=100, vq_variables=vq_vars)
    state = task.init_state(0)

    out = {}
    labels = jnp.arange(num_classes, dtype=jnp.int32)
    sampler = task.make_sampler()
    sample_kw = dict(cfg_scale=cfg.cfg_scale)
    # first call = compile + warmup (the 999-step scan body compiles once)
    imgs = sampler(state.params, jax.random.PRNGKey(0), labels, **sample_kw)
    device_sync(imgs)
    assert imgs.shape == (num_classes, 256, 256, 1) and imgs.dtype == jnp.uint8

    # best of 3 chains: a single 20 s measurement carries ±3-4% run-to-run
    # tunnel/host noise, which is most of the r2↔r3 "regression" spread
    chain_times = []
    for rep in range(3):
        t0 = time.perf_counter()
        imgs = sampler(state.params, jax.random.PRNGKey(1 + rep), labels, **sample_kw)
        device_sync(imgs)
        chain_times.append(time.perf_counter() - t0)
    chain_s = min(chain_times)
    out["ddpm_sampling_samples_per_sec_per_chip"] = num_classes / chain_s
    out["ddpm_999step_cfg_chain_seconds_batch27"] = chain_s
    out["ddpm_chain_seconds_spread"] = round(max(chain_times) - chain_s, 3)

    # XLA cost analysis counts a lax.scan body ONCE, so the jitted-chain
    # number is ~1 step's FLOPs. Count one batched-CFG UNet forward and
    # scale by the 999 scan steps for an honest chain total.
    fwd = jax.jit(task._apply_sample)
    n2 = 2 * num_classes
    fwd_args = (state.params, jnp.zeros((n2, 64, 64, cfg.latent_dim)),
                jnp.ones((n2,)), jnp.concatenate([labels, labels]),
                jnp.ones((n2,)))
    fwd_flops = _flops_of(fwd, *fwd_args)
    if fwd_flops is not None:
        chain_flops = fwd_flops * (cfg.noise_steps - 1)
        out["ddpm_unet_cfg_fwd_gflops_batch54"] = fwd_flops / 1e9
        out["ddpm_chain_tflops"] = chain_flops / 1e12
        out["ddpm_sampler_mfu_pct"] = _mfu(chain_flops, chain_s)

    # DDIM fast sampler (50 steps) — capability beyond the reference
    from spectrogramgenai_tpu.utils.benchtools import timeit_device

    ddim_kw = dict(cfg_scale=cfg.cfg_scale, sampler="ddim", num_steps=50)
    ddim_dt = timeit_device(
        lambda: sampler(state.params, jax.random.PRNGKey(3), labels, **ddim_kw), iters=5)
    out["ddim50_sampling_samples_per_sec_per_chip"] = num_classes / ddim_dt

    # DPM-Solver++(2M), 20 steps — 2nd-order: ~DDIM-50 quality at 2.5× fewer
    # UNet forwards (diffusion/ddpm.py::dpmpp_sample)
    dpmpp_kw = dict(cfg_scale=cfg.cfg_scale, sampler="dpmpp", num_steps=20)
    dpmpp_dt = timeit_device(
        lambda: sampler(state.params, jax.random.PRNGKey(3), labels, **dpmpp_kw), iters=5)
    out["dpmpp20_sampling_samples_per_sec_per_chip"] = num_classes / dpmpp_dt

    # training throughput at the reference per-device batch (train_ddpm.py:31)
    step = task.make_train_step()
    timgs = jnp.zeros((10, 256, 256, 1), jnp.float32)
    tlabs = jnp.zeros((10,), jnp.int32)
    # cost analysis on the SAME jitted step (a fresh jit would compile a
    # second multi-minute executable just to read its FLOPs)
    step_flops = _flops_of(step, state, timgs, tlabs)
    train_dt = _time_train_step(step, state, timgs, tlabs)
    out["ddpm_train_images_per_sec_per_chip_batch10"] = 10 / train_dt
    if step_flops is not None:
        out["ddpm_train_step_tflops"] = step_flops / 1e12
        out["ddpm_train_mfu_pct"] = _mfu(step_flops, train_dt)

    # batch 32: the chip's real training capacity (batch 10 is reference
    # parity, train_ddpm.py:31; 32 is the largest that fits 16 GB remat'd)
    state32 = task.init_state(0)
    imgs32 = jax.random.uniform(jax.random.PRNGKey(2), (32, 256, 256, 1))
    labs32 = jnp.zeros((32,), jnp.int32)
    flops32 = _flops_of(step, state32, imgs32, labs32)
    dt32 = _time_train_step(step, state32, imgs32, labs32)
    out["ddpm_train_images_per_sec_per_chip_batch32"] = 32 / dt32
    if flops32 is not None:
        out["ddpm_train_mfu_pct_batch32"] = _mfu(flops32, dt32)

    # gradient accumulation: effective batch 128 = 4 microbatches × the
    # 32/chip HBM capacity (cfg.grad_accum; lax.scan inside the jitted step)
    # — batches past what activations can fit, at one optimizer update
    import dataclasses

    task_ga = DiffusionTask(
        dataclasses.replace(cfg, grad_accum=4), mesh, total_steps=100, vq_variables=vq_vars
    )
    state_ga = task_ga.init_state(0)
    step_ga = task_ga.make_train_step()
    imgs128 = jax.random.uniform(jax.random.PRNGKey(4), (128, 256, 256, 1))
    labs128 = jnp.zeros((128,), jnp.int32)
    dt128 = _time_train_step(step_ga, state_ga, imgs128, labs128, iters=8)
    out["ddpm_train_images_per_sec_per_chip_batch128_accum4"] = 128 / dt128
    return out


def _bench_invert(batch=27, iters=20):
    """Spectrogram→audio inversion (audio/invert.py): the serving/audio and
    spec_to_wav hot path at the production geometry (256×256 dB mels,
    GL 32 + NNLS 32, one jitted program)."""
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.invert import db_mel_to_audio
    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig, logmel_spectrogram
    from spectrogramgenai_tpu.utils.benchtools import timeit_device

    cfg = SpectrogramConfig(sample_rate=22050)
    rng = np.random.default_rng(0)
    t = np.arange(cfg.clip_samples) / cfg.sample_rate
    audio = np.stack(
        [np.sin(2 * np.pi * (700 + 61 * k) * t) * np.exp(-0.2 * t) for k in range(batch)]
    ).astype(np.float32)
    audio += 0.05 * rng.standard_normal(audio.shape).astype(np.float32)
    db = logmel_spectrogram(jnp.asarray(audio), cfg)

    dt = timeit_device(lambda x: db_mel_to_audio(x, cfg), db, iters=iters)
    return {
        "spec_to_wav_clips_per_sec_per_chip": batch / dt,
        "spec_to_wav_batch": batch,
    }


def _bench_input_pipeline(n_images=256, batch=32):
    """Host input-pipeline throughput: viridis-PNG decode → transformed
    batches (the native C++ batch decoder path that feeds every trainer).
    Reported per host core available here; the companion key says how many
    such cores keep the capacity-batch DDPM trainer fed (production hosts
    have many; this bench VM has 1)."""
    import os
    import tempfile

    from spectrogramgenai_tpu.audio.export import save_spectrogram_pngs
    from spectrogramgenai_tpu.data.pipeline import ImageFolderSource, iterate_batches

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        cls = os.path.join(root, "class_a")
        specs = rng.standard_normal((n_images, 256, 256)).astype(np.float32)
        save_spectrogram_pngs(specs, [os.path.join(cls, f"s{i}.png") for i in range(n_images)])
        src = ImageFolderSource(root)
        next(iterate_batches(src, batch))  # warm (thread pool, page cache)
        t0 = time.perf_counter()
        seen = 0
        for b in iterate_batches(src, batch):
            seen += len(b["label"])
        dt = time.perf_counter() - t0
    ips = seen / dt
    return {"input_pipeline_images_per_sec_per_core": ips,
            "input_pipeline_host_cores": os.cpu_count()}


def _bench_cpu_ddpm_baseline():
    """Measured torch/CPU reference sampling chain (BASELINE ≥20× contract)."""
    from tools.cpu_baseline_torch import measure_sampling_baseline

    r = measure_sampling_baseline(batch=27)
    return {
        "cpu_reference_ddpm_samples_per_sec": r["samples_per_sec"],
        "cpu_reference_ddpm_chain_seconds_batch27": r["chain_seconds"],
        "cpu_reference_torch_threads": r["torch_threads"],
    }


def _bench_acgan(batch=16):
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.config import ACGANConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.train.acgan_task import ACGANTask

    cfg = ACGANConfig(run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = ACGANTask(cfg, mesh)
    state = task.init_state(0)
    step = task.make_train_step()
    imgs = jnp.zeros((batch, 256, 256, 1), jnp.float32)
    labs = jnp.zeros((batch,), jnp.int32)
    flops = _flops_of(step, state, imgs, labs)
    dt = _time_train_step(step, state, imgs, labs)
    out = {"acgan_train_steps_per_sec_batch16": 1.0 / dt,
           "acgan_train_images_per_sec_per_chip": batch / dt}
    if flops is not None:
        out["acgan_train_mfu_pct"] = _mfu(flops, dt)
    return out


def _bench_acgan_capacity(batch=64):
    """ACGAN at a capacity batch (16 is reference parity, train_acgan.py:26;
    this line shows what the chip can actually sustain)."""
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.config import ACGANConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.train.acgan_task import ACGANTask

    cfg = ACGANConfig(run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = ACGANTask(cfg, mesh)
    state = task.init_state(0)
    step = task.make_train_step()
    imgs = jnp.zeros((batch, 256, 256, 1), jnp.float32)
    labs = jnp.zeros((batch,), jnp.int32)
    flops = _flops_of(step, state, imgs, labs)
    dt = _time_train_step(step, state, imgs, labs)
    out = {f"acgan_train_images_per_sec_per_chip_batch{batch}": batch / dt}
    if flops is not None:
        out[f"acgan_train_mfu_pct_batch{batch}"] = _mfu(flops, dt)
    return out


def _bench_vqvae(batch=16):
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.config import RunConfig, VQVAEConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.train.vqvae_task import VQVAETask

    cfg = VQVAEConfig(run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = VQVAETask(cfg, mesh)
    state = task.init_state(img_size=256, seed=0)
    step = task.make_train_step()
    imgs = jnp.zeros((batch, 256, 256, 1), jnp.float32)
    flops = _flops_of(step, state, imgs)
    dt = _time_train_step(step, state, imgs)
    out = {"vqvae_train_steps_per_sec_batch16": 1.0 / dt,
           "vqvae_train_images_per_sec_per_chip": batch / dt}
    if flops is not None:
        out["vqvae_train_mfu_pct"] = _mfu(flops, dt)
    return out


def _bench_specunet(batch=8, capacity_batch=128):
    """Source-separation trainer (reference helpers.py:1084-1181): the
    transformer-denoiser MSE step at the reference batch 8, plus the
    capacity batch (throughput scales to 26% MFU at 128 — the low-channel
    stride-2 conv encoder/decoder is bandwidth-bound at small batch, same
    shape as the ACGAN generator analysis in PARITY.md)."""
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.config import RunConfig, SpecUNetConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.train.specunet_task import SpecUNetTask

    cfg = SpecUNetConfig(run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = SpecUNetTask(cfg, mesh)
    step = task.make_train_step()
    out = {}
    for b, suffix in ((batch, ""), (capacity_batch, f"_batch{capacity_batch}")):
        # the step donates its state arg — fresh state per batch size
        state = task.init_state(img_size=256, seed=0)
        mix = jnp.zeros((b, 256, 256, 1), jnp.float32)
        flops = _flops_of(step, state, mix, mix, mix)
        dt = _time_train_step(step, state, mix, mix, mix)
        out[f"specunet_train_images_per_sec_per_chip{suffix}"] = b / dt
        if flops is not None:
            out[f"specunet_train_mfu_pct{suffix}"] = _mfu(flops, dt)
    return out


def _bench_classifier(batch=16, model_name="custom", capacity_batch=None):
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.config import ClassifierConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.train.classifier_task import ClassifierTask

    cfg = ClassifierConfig(model_name=model_name, run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = ClassifierTask(cfg, mesh)
    state = task.init_state(img_size=256, seed=0)
    step = task.make_train_step()
    imgs = jnp.zeros((batch, 256, 256, 1), jnp.float32)
    labs = jnp.zeros((batch,), jnp.int32)
    flops = _flops_of(step, state, imgs, labs)
    dt = _time_train_step(step, state, imgs, labs)
    out = {f"classifier_{model_name}_train_images_per_sec_per_chip": batch / dt}
    if flops is not None:
        out[f"classifier_{model_name}_train_mfu_pct"] = _mfu(flops, dt)
    if capacity_batch:
        imgs_c = jnp.zeros((capacity_batch, 256, 256, 1), jnp.float32)
        labs_c = jnp.zeros((capacity_batch,), jnp.int32)
        # the train step donates its state arg, so the batch-16 timing above
        # consumed `state` — re-init for the capacity run
        state = task.init_state(img_size=256, seed=0)
        flops_c = _flops_of(step, state, imgs_c, labs_c)
        dt_c = _time_train_step(step, state, imgs_c, labs_c)
        out[f"classifier_{model_name}_train_images_per_sec_per_chip_batch{capacity_batch}"] = (
            capacity_batch / dt_c)
        if flops_c is not None:
            out[f"classifier_{model_name}_train_mfu_pct_batch{capacity_batch}"] = _mfu(flops_c, dt_c)
    return out


def _bench_classifier_sweep():
    """The reference's actual expensive workload: the resnet18/vgg16/
    mobilenet_v2/ensemble × synthetic-count sweep (train_classifiers.py:73-81,
    helpers.py:314-358). One train-step line per arch at the reference
    batch 16; custom additionally at a capacity batch."""
    out = {}
    for name in ("resnet18", "vgg16", "mobilenet_v2", "ensemble"):
        out.update(_bench_classifier(model_name=name))
    return out


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig

    errors: dict[str, str] = {}

    def section(name, fn):
        print(f"bench: {name}…", file=sys.stderr, flush=True)
        try:
            r = fn()
            # partial results survive an external timeout of the whole run
            print(f"bench: {name} done {json.dumps(r)}", file=sys.stderr, flush=True)
            return r
        except Exception as e:
            traceback.print_exc()
            errors[name] = f"{type(e).__name__}: {e}"
            return {}

    cfg = SpectrogramConfig(sample_rate=22050)
    print("bench: mel…", file=sys.stderr, flush=True)
    dev_sps, cpu_sps, max_err_db, mel_extra = _bench_mel(cfg)  # headline — let it raise
    print(f"bench: mel done ({dev_sps:.0f}/s)", file=sys.stderr, flush=True)

    result = {
        "metric": "wav->mel 256x256 log-mel specs/sec (fused Pallas, 1 chip)",
        "value": round(dev_sps, 1),
        "unit": "specs/sec",
        "vs_baseline": round(dev_sps / cpu_sps, 1),
        "cpu_reference_specs_per_sec": round(cpu_sps, 2),
        "mel_parity_max_err_db": round(max_err_db, 6),
    }
    result.update(mel_extra)
    result.update(section("ddpm", _bench_ddpm))
    result.update(section("cpu_ddpm_baseline", _bench_cpu_ddpm_baseline))
    result.update(section("acgan", _bench_acgan))
    result.update(section("acgan_capacity", _bench_acgan_capacity))
    result.update(section("vqvae", _bench_vqvae))
    result.update(section("specunet", _bench_specunet))
    result.update(section("classifier", lambda: _bench_classifier(capacity_batch=256)))
    result.update(section("classifier_sweep", _bench_classifier_sweep))
    result.update(section("invert", _bench_invert))
    result.update(section("input_pipeline", _bench_input_pipeline))

    ips = result.get("input_pipeline_images_per_sec_per_core")
    train_ips = result.get("ddpm_train_images_per_sec_per_chip_batch32")
    if ips and train_ips:
        # host cores needed to keep one chip's capacity-batch trainer fed
        result["input_pipeline_cores_per_chip_ddpm32"] = round(train_ips / ips, 2)

    tpu_sps = result.get("ddpm_sampling_samples_per_sec_per_chip")
    cpu_ddpm = result.get("cpu_reference_ddpm_samples_per_sec")
    if tpu_sps and cpu_ddpm:
        result["ddpm_vs_cpu_baseline"] = round(tpu_sps / cpu_ddpm, 1)

    result = {k: (round(v, 6) if isinstance(v, float) else v) for k, v in result.items()}
    if errors:
        result["errors"] = errors
    result["backend"] = jax.default_backend()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
