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

Timeout-proofing (the r3 official record was rc=124/unparseable because the
driver's time limit hit mid-run and the single final JSON line never
printed; the r4 record was rc=0/unparseable because the verbose final line
was ~3.3k chars against the driver's 2,000-char output tail):
  * After EVERY section the cumulative record is printed as one complete
    stdout line in a COMPACT grouped form (slim_record, <1800 chars —
    asserted in tests/test_bench_record.py; docs/BENCH_SCHEMA.md maps the
    short names) — the driver parses the last line, so an external kill
    still yields a valid, maximal record (with meta.incomplete). The full
    verbose record is written to BENCH_full_last.json at every emit.
  * An elapsed-time budget guard (BENCH_BUDGET_S, default 780 s) skips any
    section whose estimated cost no longer fits; estimates self-correct
    with the last measured section durations from BENCH_local.json.
  * Sections run BASELINE-critical-first (mel headline, DDPM chain + ratios)
    then cheapest-first so breadth survives a slow chain.
  * CPU reference baselines are PINNED (tools/cpu_baselines.json — fastest
    ever measured on an idle host = hardest baseline; this 1-core VM's load
    wobbled the denominator 40% between r2 and r3 when re-measured live).
    bench only runs a cheap consistency spot-check; full re-measurement is
    behind BENCH_MEASURE_CPU=1.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12  # per chip

_PIN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "cpu_baselines.json")


def _load_pins() -> dict:
    with open(_PIN_PATH) as f:
        return json.load(f)


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


def load_prior_record(path: str | None = None) -> dict:
    """Full prior record (BENCH_local.json, committed, refreshed whenever a
    big-budget full pass runs — see its "record_date"). Keys from sections
    the budget guard skips are backfilled from it so the driver-captured
    record is always COMPLETE, with provenance (assemble_record lists every
    backfilled key in "keys_from_prior_record"). Run-specific meta never
    backfills; headline keys (metric/value/…) stay, so even a failed mel
    section leaves a valid headline, clearly marked."""
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_local.json")
    try:
        with open(path) as f:
            prior = json.load(f)
        for meta in ("backend", "section_seconds", "bench_elapsed_s",
                     "skipped_sections", "bench_incomplete", "errors",
                     "keys_from_prior_record", "prior_record_date"):
            prior.pop(meta, None)
        return prior
    except Exception:
        return {}


def assemble_record(result: dict, prior: dict, *, errors: dict, skipped: list,
                    section_seconds: dict, elapsed_s: float, incomplete: bool,
                    backend: str) -> dict:
    """One cumulative bench record: fresh keys win, prior keys backfill with
    provenance, derived ratios recompute over the merged view (pure function
    — unit-tested in tests/test_bench_record.py)."""
    out = dict(result)
    backfill = {k: v for k, v in prior.items()
                if k not in out and k != "record_date"}
    if backfill:
        out.update(backfill)
        out["prior_record_date"] = prior.get("record_date", "unknown")
    recomputed = set()
    ips = out.get("input_pipeline_images_per_sec_per_core")
    train_ips = out.get("ddpm_train_images_per_sec_per_chip_batch32")
    if ips and train_ips:
        # host cores needed to keep one chip's capacity-batch trainer fed
        out["input_pipeline_cores_per_chip_ddpm32"] = round(train_ips / ips, 2)
        recomputed.add("input_pipeline_cores_per_chip_ddpm32")
    tpu_sps = out.get("ddpm_sampling_samples_per_sec_per_chip")
    cpu_ddpm = out.get("cpu_reference_ddpm_samples_per_sec")
    if tpu_sps and cpu_ddpm:
        out["ddpm_vs_cpu_baseline"] = round(tpu_sps / cpu_ddpm, 1)
        recomputed.add("ddpm_vs_cpu_baseline")
    if backfill:
        # derived ratios recomputed over the merged view aren't prior data
        carried = [k for k in sorted(backfill) if k not in recomputed]
        if carried:
            out["keys_from_prior_record"] = carried
        else:
            del out["prior_record_date"]
    out = {k: (round(v, 6) if isinstance(v, float) else v) for k, v in out.items()}
    if errors:
        out["errors"] = errors
    if skipped:
        out["skipped_sections"] = list(skipped)
    if incomplete:
        out["bench_incomplete"] = True
    out["section_seconds"] = {k: round(v, 1) for k, v in section_seconds.items()}
    out["bench_elapsed_s"] = round(elapsed_s, 1)
    out["backend"] = backend
    return out


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

    def _lap(tag, t0):
        # sub-phase stderr timing: the mel section wobbled 38↔200 s between
        # back-to-back warm r4 runs — this pins WHICH phase (program load
        # into the axon worker vs CPU spot vs high-mode) eats the variance
        print(f"bench: mel.{tag} {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        return time.perf_counter()

    fn = (lambda x: fused_logmel(x, cfg)) if on_tpu else (lambda x: logmel_spectrogram(x, cfg))
    t_lap = time.perf_counter()
    dt = timeit_device(fn, xa, iters=iters)
    t_lap = _lap("exact", t_lap)
    dev_specs_per_sec = batch / dt

    # CPU reference (identical librosa-parity math, NumPy/pocketfft): PINNED
    # idle-host constant (tools/cpu_baselines.json — fastest ever measured =
    # hardest baseline). A one-clip spot-check rides along so drift in the
    # reference math itself cannot hide behind the pin; full re-measurement
    # is behind BENCH_MEASURE_CPU=1 (see tools/pin_cpu_baselines.py).
    pins = _load_pins()
    cpu_specs_per_sec = pins["mel"]["specs_per_sec"]
    reference_logmel_np(audio[0], cfg)  # warm
    t0 = time.perf_counter()
    reference_logmel_np(audio[1], cfg)
    spot_sps = 1.0 / (time.perf_counter() - t0)
    if os.environ.get("BENCH_MEASURE_CPU"):
        per_clip = []
        for i in range(6):
            t0 = time.perf_counter()
            reference_logmel_np(audio[i], cfg)
            per_clip.append(time.perf_counter() - t0)
        spot_sps = 1.0 / min(per_clip)

    t_lap = _lap("cpu_spot", t_lap)

    # Parity check rides along so the number is honest. Reuse the full-batch
    # program (the one actually timed): a `fn(xa[:2])` call is a DIFFERENT
    # shape → a second program compile+load into the remote axon worker,
    # measured at 30-90 s of pure tunnel overhead per mode.
    got = np.asarray(fn(xa))[:2]
    ref = np.stack([reference_logmel_np(audio[i], cfg) for i in range(2)])
    max_err_db = float(np.abs(got - ref).max())
    t_lap = _lap("parity", t_lap)

    extra = {
        "cpu_mel_pinned": True,
        "cpu_mel_spot_specs_per_sec": round(spot_sps, 2),
        # >1 means this run's host is slower than the pinned idle baseline
        # (ratios stay honest because the denominator doesn't move with load)
        "cpu_mel_pin_over_spot": round(cpu_specs_per_sec / spot_sps, 2),
    }
    if on_tpu:
        # "high" mode: hand-rolled 3-pass bf16 matmuls (bf16_3x) — measured
        # ~3× the exact-mode throughput at ≲0.05 dB error, ~7× below the
        # 0.31 dB/level uint8-PNG quantization of the reference data path.
        fn_h = lambda x: fused_logmel(x, cfg, exact="high")  # noqa: E731
        dt_h = timeit_device(fn_h, xa, iters=iters)
        got_h = np.asarray(fn_h(xa))[:2]  # same-shape program — see above
        extra["mel_specs_per_sec_high_mode"] = batch / dt_h
        extra["mel_high_mode_max_err_db"] = float(np.abs(got_h - ref).max())
        _lap("high", t_lap)

    return dev_specs_per_sec, cpu_specs_per_sec, max_err_db, extra


_DDPM_CTX: dict = {}


def _ddpm_ctx(num_classes=27):
    """Shared lazy setup for the ddpm_sample / ddpm_train sections (split in
    r4 so a tight budget still captures the BASELINE-critical chain numbers
    before the slower train-variant programs load through the tunnel)."""
    if _DDPM_CTX:
        return _DDPM_CTX
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
    _DDPM_CTX.update(cfg=cfg, mesh=mesh, vq_vars=vq_vars, task=task,
                     state=task.init_state(0), sampler=task.make_sampler(),
                     labels=jnp.arange(num_classes, dtype=jnp.int32))
    return _DDPM_CTX


def _bench_ddpm_chain(num_classes=27):
    """Full 999-step latent CFG chain + quantize/decode → 256×256 uint8 and
    chain FLOPs/MFU — the BASELINE ≥20×-vs-CPU contract numbers. Split from
    the old monolithic ddpm_sample section in r5 (VERDICT r4 weak #3): its
    330 s estimate ran 712 s in the official record because ONE section
    carried four distinct jitted programs' worth of worker-session load tax
    and starved 11 downstream sections. Now each sampler variant is its own
    section with its own estimate."""
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.utils.benchtools import device_sync

    ctx = _ddpm_ctx(num_classes)
    cfg, task, state, labels = ctx["cfg"], ctx["task"], ctx["state"], ctx["labels"]

    out = {}
    sampler = ctx["sampler"]
    sample_kw = dict(cfg_scale=cfg.cfg_scale)
    # first call = compile + warmup (the 999-step scan body compiles once)
    imgs = sampler(state.params, jax.random.PRNGKey(0), labels, **sample_kw)
    device_sync(imgs)
    assert imgs.shape == (num_classes, 256, 256, 1) and imgs.dtype == jnp.uint8

    # best of 2 chains: a single 20 s measurement carries ±3-4% run-to-run
    # tunnel/host noise, which is most of the r2↔r3 "regression" spread
    # (was 3 reps; 2 keeps the spread key while freeing ~20 s of budget)
    chain_times = []
    for rep in range(2):
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
    return out


def _bench_ddim(num_classes=27):
    """DDIM fast sampler (50 steps) — capability beyond the reference."""
    import jax

    from spectrogramgenai_tpu.utils.benchtools import timeit_device

    ctx = _ddpm_ctx(num_classes)
    cfg, state, labels, sampler = ctx["cfg"], ctx["state"], ctx["labels"], ctx["sampler"]
    ddim_kw = dict(cfg_scale=cfg.cfg_scale, sampler="ddim", num_steps=50)
    ddim_dt = timeit_device(
        lambda: sampler(state.params, jax.random.PRNGKey(3), labels, **ddim_kw), iters=5)
    return {"ddim50_sampling_samples_per_sec_per_chip": num_classes / ddim_dt}


def _bench_dpmpp(num_classes=27):
    """DPM-Solver++(2M), 20 steps — 2nd-order: ~DDIM-50 quality at 2.5× fewer
    UNet forwards (diffusion/ddpm.py::dpmpp_sample); the serving/export
    default since r4."""
    import jax

    from spectrogramgenai_tpu.utils.benchtools import timeit_device

    ctx = _ddpm_ctx(num_classes)
    cfg, state, labels, sampler = ctx["cfg"], ctx["state"], ctx["labels"], ctx["sampler"]
    dpmpp_kw = dict(cfg_scale=cfg.cfg_scale, sampler="dpmpp", num_steps=20)
    dpmpp_dt = timeit_device(
        lambda: sampler(state.params, jax.random.PRNGKey(3), labels, **dpmpp_kw), iters=5)
    return {"dpmpp20_sampling_samples_per_sec_per_chip": num_classes / dpmpp_dt}


def _bench_ddpm_train(num_classes=27):
    """DDPM train-step throughput + MFU at reference batch 10, capacity
    batch 32, and effective batch 128 via 4× gradient accumulation."""
    import jax
    import jax.numpy as jnp

    ctx = _ddpm_ctx(num_classes)
    cfg, mesh, vq_vars = ctx["cfg"], ctx["mesh"], ctx["vq_vars"]
    task, state = ctx["task"], ctx["state"]

    out = {}
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

    # latent-cached training (cli/train_ddpm.py default): the frozen VQ
    # encode (22% of the step, tools/train_ablation.py) runs once per image
    # at startup instead of once per image×epoch — the step consumes
    # pre-encoded latents
    lat32 = task.make_encoder()(imgs32)
    step_c = task.make_train_step(encoded=True)
    state_c = task.init_state(0)
    dt32c = _time_train_step(step_c, state_c, lat32, labs32)
    out["ddpm_train_images_per_sec_per_chip_batch32_cached"] = 32 / dt32c

    # gradient accumulation: effective batch 128 = 4 microbatches × the
    # 32/chip HBM capacity (cfg.grad_accum; lax.scan inside the jitted step)
    # — batches past what activations can fit, at one optimizer update
    import dataclasses

    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask

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
    """Torch/CPU reference sampling chain (BASELINE ≥20× contract): PINNED
    idle-host constants (tools/cpu_baselines.json); full re-measurement only
    with BENCH_MEASURE_CPU=1 — the live value wobbled 40% with host load
    between r2 and r3 and the measurement itself ate minutes of bench budget."""
    pins = _load_pins()["ddpm"]
    out = {
        "cpu_reference_ddpm_samples_per_sec": pins["samples_per_sec"],
        "cpu_reference_ddpm_chain_seconds_batch27": pins["chain_seconds_batch27"],
        "cpu_reference_torch_threads": pins["torch_threads"],
        "cpu_ddpm_pinned": True,
    }
    if os.environ.get("BENCH_MEASURE_CPU"):
        from tools.cpu_baseline_torch import measure_sampling_baseline

        r = measure_sampling_baseline(batch=27)
        out.update(
            cpu_reference_ddpm_samples_per_sec=r["samples_per_sec"],
            cpu_reference_ddpm_chain_seconds_batch27=r["chain_seconds"],
            cpu_reference_torch_threads=r["torch_threads"],
            cpu_ddpm_pinned=False,
        )
    return out


def _bench_serve_dpmpp(batch=27, requests=4):
    """Served throughput of the production path: the dynamic-batching sampler
    (serving/server.py::BatchingSampler) driving the fixed-shape
    DPM-Solver++(2M) 20-step chain — the serving default since r4. Measures
    end-to-end wall time through the coalescing queue (submit → futures
    resolved), not just the raw chain."""
    import jax

    from spectrogramgenai_tpu.core.config import DDPMConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.models.vqvae import VQVAE
    from spectrogramgenai_tpu.serving.server import BatchingSampler
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask

    import jax.numpy as jnp

    cfg = DDPMConfig(img_size=256, latent=True, num_classes=batch, run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    vq = VQVAE(latent_dim=cfg.latent_dim, dtype=jnp.bfloat16)
    vq_vars = vq.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 256, 256, 1)))
    task = DiffusionTask(cfg, mesh, total_steps=100, vq_variables=vq_vars)
    state = task.init_state(0)

    sampler = BatchingSampler(task, state, batch_size=batch, max_delay_ms=20.0,
                              sampler="dpmpp", num_steps=20)
    try:
        sampler.submit(0, count=batch).result(timeout=900)  # compile + warm
        t0 = time.perf_counter()
        futs = [sampler.submit(i % batch, count=batch) for i in range(requests)]
        for f in futs:
            f.result(timeout=900)
        dt = time.perf_counter() - t0
    finally:
        sampler.close()
    n_imgs = requests * batch
    stats = sampler.snapshot_stats()
    return {
        "serve_dpmpp20_images_per_sec_per_chip": n_imgs / dt,
        "serve_dpmpp20_batch": batch,
        "serve_dpmpp20_mean_occupancy": stats.get("mean_occupancy"),
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


def _bench_classifier_ensemble_accum(effective_batch=64, accum=4):
    """Execute the ensemble classifier at effective batch 64 on ONE 16 GB
    chip via gradient accumulation (4 × 16 microbatches, train/common.py
    scan) — the exact workload that hard-crashed the chip at a DIRECT
    batch 64 (core/config.py:165, reference helpers.py:740-798 trains the
    ensemble). Direct batch 64 must never be re-attempted here (worker
    recovery is ~10-25 min); accumulation keeps only one microbatch-16's
    activations live, which is the proven-safe geometry."""
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.config import ClassifierConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.train.classifier_task import ClassifierTask

    cfg = ClassifierConfig(model_name="ensemble", grad_accum=accum,
                           run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = ClassifierTask(cfg, mesh)
    state = task.init_state(img_size=256, seed=0)
    step = task.make_train_step()
    imgs = jnp.zeros((effective_batch, 256, 256, 1), jnp.float32)
    labs = jnp.zeros((effective_batch,), jnp.int32)
    flops = _flops_of(step, state, imgs, labs)
    dt = _time_train_step(step, state, imgs, labs, iters=8)
    out = {
        f"classifier_ensemble_train_images_per_sec_per_chip_batch{effective_batch}"
        f"_accum{accum}": effective_batch / dt,
    }
    if flops is not None:
        out[f"classifier_ensemble_train_mfu_pct_batch{effective_batch}_accum{accum}"] = (
            _mfu(flops, dt))
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


def _bench_mel_section():
    """Headline section: fused-Pallas mel throughput + parity + CPU pin."""
    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig

    cfg = SpectrogramConfig(sample_rate=22050)
    dev_sps, cpu_sps, max_err_db, mel_extra = _bench_mel(cfg)
    out = {
        "metric": "wav->mel 256x256 log-mel specs/sec (fused Pallas, 1 chip)",
        "value": round(dev_sps, 1),
        "unit": "specs/sec",
        "vs_baseline": round(dev_sps / cpu_sps, 1),
        "cpu_reference_specs_per_sec": round(cpu_sps, 2),
        "mel_parity_max_err_db": round(max_err_db, 6),
    }
    out.update(mel_extra)
    return out


# The section registry, consumed by BOTH main()'s budget loop and
# tools/run_bench_section.py (hoisted in r5 — the tool used to hand-duplicate
# this list). Entries are (name, fn, static estimated seconds with a WARM
# persistent compile cache). The budget guard additionally self-corrects each
# estimate with the last measured duration from BENCH_local.json's
# section_seconds (max(static, measured) — the r4 official record's
# ddpm_sample estimate of 330 s ran 712 s and starved 11 sections). Even a
# warm run pays ~30-90 s per distinct jitted program just to LOAD it into
# the remote axon worker, which is why the monolithic ddpm_sample section
# (4 programs) is split into ddpm_chain / ddim / dpmpp, and why the order
# is: pinned + headline + BASELINE-critical chain first, then the CHEAP
# sections (so breadth survives a slow chain), then the heavies.
SECTIONS = [
    ("cpu_ddpm_baseline", _bench_cpu_ddpm_baseline, 1),  # pinned — free
    ("mel", _bench_mel_section, 150),
    ("ddpm_chain", _bench_ddpm_chain, 220),
    ("invert", _bench_invert, 12),
    ("input_pipeline", _bench_input_pipeline, 10),
    ("vqvae", _bench_vqvae, 12),
    ("classifier", lambda: _bench_classifier(capacity_batch=256), 25),
    ("acgan_capacity", _bench_acgan_capacity, 20),
    ("dpmpp", _bench_dpmpp, 60),
    ("ddim", _bench_ddim, 60),
    ("serve_dpmpp", _bench_serve_dpmpp, 30),
    ("specunet", _bench_specunet, 60),
    ("acgan", _bench_acgan, 90),
    ("classifier_ensemble_accum", _bench_classifier_ensemble_accum, 90),
    ("ddpm_train", _bench_ddpm_train, 280),
    ("classifier_sweep", _bench_classifier_sweep, 210),
]


def load_prior_sections(path: str | None = None) -> dict:
    """Last measured per-section durations (BENCH_local.json's
    section_seconds) — the self-correcting input to the budget guard."""
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_local.json")
    try:
        with open(path) as f:
            secs = json.load(f).get("section_seconds", {})
        return {k: float(v) for k, v in secs.items()}
    except Exception:
        return {}


# ---------------------------------------------------------------------------
# Slim stdout record (r5). The driver retains only the LAST 2,000 characters
# of output and json-parses the last line; the full verbose record is ~3.3k
# chars (r4's official record was parsed:null because the line's head fell
# off the window). So stdout carries a COMPACT grouped record (<1800 chars,
# asserted in tests/test_bench_record.py) holding every measured metric
# under short names; the full verbose record goes to BENCH_full_last.json
# next to bench.py at every emit. docs/BENCH_SCHEMA.md maps short → verbose.

_HEADLINE_KEYS = ("metric", "value", "unit", "vs_baseline")

# verbose key → (group, short key). Grouping strips the repeated prefixes
# that made the flat record unparseable through the driver's tail window.
_SLIM_MAP = {
    "cpu_reference_specs_per_sec": ("mel", "cpu_sps"),
    "mel_parity_max_err_db": ("mel", "err_db"),
    "cpu_mel_spot_specs_per_sec": ("mel", "cpu_spot_sps"),
    "cpu_mel_pin_over_spot": ("mel", "pin_over_spot"),
    "mel_specs_per_sec_high_mode": ("mel", "high_sps"),
    "mel_high_mode_max_err_db": ("mel", "high_err_db"),
    "cpu_reference_ddpm_samples_per_sec": ("ddpm", "cpu_sps"),
    "cpu_reference_ddpm_chain_seconds_batch27": ("ddpm", "cpu_chain_s"),
    "ddpm_sampling_samples_per_sec_per_chip": ("ddpm", "sample_sps"),
    "ddpm_999step_cfg_chain_seconds_batch27": ("ddpm", "chain_s"),
    "ddpm_chain_seconds_spread": ("ddpm", "chain_spread_s"),
    "ddpm_unet_cfg_fwd_gflops_batch54": ("ddpm", "fwd_gflops"),
    "ddpm_chain_tflops": ("ddpm", "chain_tflops"),
    "ddpm_sampler_mfu_pct": ("ddpm", "sample_mfu"),
    "ddim50_sampling_samples_per_sec_per_chip": ("ddpm", "ddim50_sps"),
    "dpmpp20_sampling_samples_per_sec_per_chip": ("ddpm", "dpmpp20_sps"),
    "ddpm_vs_cpu_baseline": ("ddpm", "vs_cpu"),
    "ddpm_train_images_per_sec_per_chip_batch10": ("ddpm", "train_ips_b10"),
    "ddpm_train_step_tflops": ("ddpm", "train_tflops"),
    "ddpm_train_mfu_pct": ("ddpm", "train_mfu_b10"),
    "ddpm_train_images_per_sec_per_chip_batch32": ("ddpm", "train_ips_b32"),
    "ddpm_train_mfu_pct_batch32": ("ddpm", "train_mfu_b32"),
    "ddpm_train_images_per_sec_per_chip_batch32_cached": ("ddpm", "train_ips_b32_cached"),
    "ddpm_train_images_per_sec_per_chip_batch128_accum4": ("ddpm", "train_ips_b128_ga4"),
    "spec_to_wav_clips_per_sec_per_chip": ("io", "spec_to_wav_cps"),
    "input_pipeline_images_per_sec_per_core": ("io", "pipeline_ips_core"),
    "input_pipeline_cores_per_chip_ddpm32": ("io", "cores_per_chip"),
    "vqvae_train_steps_per_sec_batch16": ("vqvae", "steps_ps_b16"),
    "vqvae_train_images_per_sec_per_chip": ("vqvae", "ips"),
    "vqvae_train_mfu_pct": ("vqvae", "mfu"),
    "specunet_train_images_per_sec_per_chip": ("specunet", "ips"),
    "specunet_train_mfu_pct": ("specunet", "mfu"),
    "specunet_train_images_per_sec_per_chip_batch128": ("specunet", "ips_b128"),
    "specunet_train_mfu_pct_batch128": ("specunet", "mfu_b128"),
    "acgan_train_steps_per_sec_batch16": ("acgan", "steps_ps_b16"),
    "acgan_train_images_per_sec_per_chip": ("acgan", "ips"),
    "acgan_train_mfu_pct": ("acgan", "mfu"),
    "acgan_train_images_per_sec_per_chip_batch64": ("acgan", "ips_b64"),
    "acgan_train_mfu_pct_batch64": ("acgan", "mfu_b64"),
    "serve_dpmpp20_images_per_sec_per_chip": ("serve", "dpmpp20_ips"),
    "serve_dpmpp20_mean_occupancy": ("serve", "occupancy"),
    "classifier_custom_train_images_per_sec_per_chip": ("cls", "custom_ips"),
    "classifier_custom_train_mfu_pct": ("cls", "custom_mfu"),
    "classifier_custom_train_images_per_sec_per_chip_batch256": ("cls", "custom_ips_b256"),
    "classifier_custom_train_mfu_pct_batch256": ("cls", "custom_mfu_b256"),
    "classifier_resnet18_train_images_per_sec_per_chip": ("cls", "resnet18_ips"),
    "classifier_resnet18_train_mfu_pct": ("cls", "resnet18_mfu"),
    "classifier_vgg16_train_images_per_sec_per_chip": ("cls", "vgg16_ips"),
    "classifier_vgg16_train_mfu_pct": ("cls", "vgg16_mfu"),
    "classifier_mobilenet_v2_train_images_per_sec_per_chip": ("cls", "mobilenet_ips"),
    "classifier_mobilenet_v2_train_mfu_pct": ("cls", "mobilenet_mfu"),
    "classifier_ensemble_train_images_per_sec_per_chip": ("cls", "ensemble_ips"),
    "classifier_ensemble_train_mfu_pct": ("cls", "ensemble_mfu"),
    "classifier_ensemble_train_images_per_sec_per_chip_batch64_accum4":
        ("cls", "ensemble_ips_b64_ga4"),
    "classifier_ensemble_train_mfu_pct_batch64_accum4": ("cls", "ensemble_mfu_b64_ga4"),
}

# Config constants (not measurements): present in the full record / schema
# doc, dropped from the slim stdout line to buy tail-window headroom.
_SLIM_DROP = {
    "cpu_mel_pinned", "cpu_ddpm_pinned", "cpu_reference_torch_threads",
    "input_pipeline_host_cores", "spec_to_wav_batch", "serve_dpmpp20_batch",
}

_SLIM_META = {
    "backend", "bench_elapsed_s", "skipped_sections", "errors",
    "bench_incomplete", "prior_record_date", "keys_from_prior_record",
    "section_seconds", "record_date",
}

_GROUP_ORDER = ("mel", "ddpm", "vqvae", "acgan", "specunet", "cls", "io", "serve")


def _sig4(v):
    return float(f"{v:.4g}") if isinstance(v, float) else v


def slim_record(full: dict) -> dict:
    """Compact grouped form of the verbose record for the driver's stdout
    line (pure function — unit-tested against the full current keyset to
    stay under the 2,000-char tail window with margin)."""
    out: dict = {}
    groups: dict[str, dict] = {}
    misc: dict = {}
    for k, v in full.items():
        if k in _HEADLINE_KEYS:
            out[k] = _sig4(v)
        elif k in _SLIM_DROP or k in _SLIM_META:
            continue
        elif k in _SLIM_MAP:
            g, short = _SLIM_MAP[k]
            groups.setdefault(g, {})[short] = _sig4(v)
        else:
            misc[k] = _sig4(v)  # unmapped key: keep verbose, never drop
    for g in _GROUP_ORDER:
        if g in groups:
            out[g] = groups[g]
    for g in sorted(set(groups) - set(_GROUP_ORDER)):
        out[g] = groups[g]
    if misc:
        out["misc"] = misc
    meta: dict = {"backend": full.get("backend")}
    if full.get("bench_elapsed_s") is not None:
        meta["elapsed_s"] = _sig4(full["bench_elapsed_s"])
    if full.get("section_seconds"):
        meta["live_sections"] = len(full["section_seconds"])
    if full.get("skipped_sections"):
        meta["skipped"] = len(full["skipped_sections"])
    if full.get("errors"):
        meta["errors"] = len(full["errors"])
    if full.get("keys_from_prior_record"):
        meta["backfilled_keys"] = len(full["keys_from_prior_record"])
    if full.get("prior_record_date"):
        meta["prior"] = full["prior_record_date"]
    if full.get("bench_incomplete"):
        meta["incomplete"] = True
    meta["schema"] = "docs/BENCH_SCHEMA.md"
    out["meta"] = meta
    return out


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET_S", "780"))
    errors: dict[str, str] = {}
    section_seconds: dict[str, float] = {}
    result: dict = {}

    skipped = [name for name, _, _ in SECTIONS]
    prior = load_prior_record()
    prior_secs = load_prior_sections()
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_full_last.json")

    def emit(incomplete: bool):
        """Emit the cumulative record: the SLIM grouped form as one stdout
        line (the driver parses the last line of its 2,000-char tail), the
        full verbose form to BENCH_full_last.json. Every section boundary
        leaves a valid, maximal record behind — an external kill at any
        point still parses."""
        out = assemble_record(
            result, prior, errors=errors, skipped=skipped,
            section_seconds=section_seconds,
            elapsed_s=time.perf_counter() - t_start, incomplete=incomplete,
            backend=jax.default_backend())
        try:
            with open(full_path, "w") as f:
                json.dump(out, f, indent=1)
                f.write("\n")
        except OSError:
            pass
        print(json.dumps(slim_record(out)), flush=True)
        return out

    # line 0, before ANY device work: a fully prior-backfilled record. The
    # first program load into a fresh axon worker session was measured at
    # 38→575 s across back-to-back runs (worker-state dependent, not ours) —
    # without this, an external kill during the mel warmup would leave an
    # EMPTY stdout (r3's parsed:null all over again).
    emit(incomplete=True)

    for name, fn, static_est in SECTIONS:
        # self-correcting guard input: a section that overran its static
        # estimate last full pass keeps its measured cost (r4's ddpm_sample
        # 330-s estimate ran 712 s and silently starved 11 sections)
        est = max(static_est, prior_secs.get(name, 0.0))
        remaining = budget - (time.perf_counter() - t_start)
        if remaining < est:
            print(f"bench: SKIP {name} (est {est:.0f}s > {remaining:.0f}s left of "
                  f"BENCH_BUDGET_S={budget:.0f})", file=sys.stderr, flush=True)
            continue
        print(f"bench: {name}…", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            r = fn()
            result.update(r)
            print(f"bench: {name} done {json.dumps(r)}", file=sys.stderr, flush=True)
        except Exception as e:
            traceback.print_exc()
            errors[name] = f"{type(e).__name__}: {e}"
        section_seconds[name] = time.perf_counter() - t0
        skipped.remove(name)
        emit(incomplete=True)

    # final line: the complete record (the only one without bench_incomplete;
    # any sections still in `skipped` were budget-skipped, not lost)
    emit(incomplete=False)


if __name__ == "__main__":
    main()
