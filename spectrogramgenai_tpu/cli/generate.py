"""Conditional generation CLI (rebuild of reference ddpm_conditional_generate.py).

Loads a trained DDPM checkpoint and emits `num_samples` rounds of
one-image-per-class viridis PNGs named ``{class}_gen_imgs_{i}_{samp}.png``
(diff_modules.py:759-775). Optional ``--sav_denoise_path`` dumps the latent
2×2 grid + decoded image every 50 denoising steps (the reference's
trajectory-inspection feature), instead of final images.

  python -m spectrogramgenai_tpu.cli.generate --run.run_name ddpm \
      --img_folder gen_images --num_samples 10 --start_idx 0
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def run(cfg, img_folder: str, num_samples: int, start_idx: int, class_names: list[str],
        sav_denoise_path: str | None = None, use_ema: bool = False,
        sampler: str = "ddpm", num_steps: int = 50, artifact: str | None = None,
        force_batch: bool = False, audio_dir: str | None = None,
        audio_out_sr: int | None = None):
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.export import save_generated_pngs
    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.core.limits import check_sampling_label_batch
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask
    from spectrogramgenai_tpu.cli.train_ddpm import load_vq_variables

    if artifact:
        return _run_from_artifact(artifact, img_folder, num_samples, start_idx, class_names,
                                  force_batch=force_batch, audio_dir=audio_dir,
                                  audio_out_sr=audio_out_sr)

    mesh = create_mesh(MeshSpec(cfg.run.mesh_data, cfg.run.mesh_model))
    vq_vars = load_vq_variables(cfg.vqae_ckpt, cfg) if cfg.latent else None
    task = DiffusionTask(cfg, mesh, total_steps=1, vq_variables=vq_vars)
    state = task.init_state()
    ckpt = CheckpointManager(os.path.join("models", cfg.run.run_name))
    restored = ckpt.restore(state)
    if restored is None:
        raise FileNotFoundError(f"no DDPM checkpoint under models/{cfg.run.run_name}")
    state = restored

    os.makedirs(img_folder, exist_ok=True)
    labels = jnp.arange(cfg.num_classes, dtype=jnp.int32)

    if sav_denoise_path:
        os.makedirs(sav_denoise_path, exist_ok=True)
        _dump_denoise_trajectory(task, state, labels, class_names, sav_denoise_path, use_ema)
        print("not saving images, just noise portions")  # reference message parity
        return

    # Batch multiple rounds into one reverse chain: the 999-step scan is
    # launch-bound at batch num_classes, so k rounds per chain raise
    # samples/sec/chip substantially (bench: 27→108 improves throughput).
    rounds_per_chain = max(1, min(cfg.rounds_per_chain, num_samples))
    # refuse worker-killing chain batches before compiling (core/limits.py)
    check_sampling_label_batch(rounds_per_chain * cfg.num_classes, force=force_batch)
    samp_i = start_idx
    remaining = num_samples
    while remaining > 0:
        k = min(rounds_per_chain, remaining)
        big_labels = jnp.tile(labels, k)
        imgs = np.asarray(task.sample(state, jax.random.PRNGKey(samp_i), big_labels,
                                      use_ema=use_ema, sampler=sampler, num_steps=num_steps))
        n = labels.shape[0]
        out_paths = [
            os.path.join(img_folder, f"{class_names[lab]}_gen_imgs_{i}_{samp_i + r}.png")
            for r in range(k)
            for i, lab in enumerate(np.asarray(labels))
        ]
        save_generated_pngs(imgs[: k * n], out_paths)
        if audio_dir:
            _write_audio(imgs[: k * n], out_paths, audio_dir, audio_out_sr)
        print(f"sample rounds {samp_i}..{samp_i + k - 1}: wrote {k * n} images")
        samp_i += k
        remaining -= k


def _write_audio(imgs_uint8, png_paths: list[str], audio_dir: str,
                 out_sr: int | None) -> None:
    """Reconstruct waveforms from the in-memory generated samples (same
    inversion as cli.spec_to_wav, without the PNG round-trip) and write
    `{png stem}.wav` next to each image name under `audio_dir`."""
    from spectrogramgenai_tpu.audio.invert import AudioReconstructor
    from spectrogramgenai_tpu.audio.wavio import save_wav

    os.makedirs(audio_dir, exist_ok=True)
    # AudioReconstructor is a stateless config holder — jax's jit cache
    # already dedupes the compiled inversion programs across calls
    wavs, sr = AudioReconstructor(out_sr=out_sr).waveforms(np.asarray(imgs_uint8))
    for wav, png_path in zip(wavs, png_paths):
        stem = os.path.splitext(os.path.basename(png_path))[0]
        save_wav(os.path.join(audio_dir, stem + ".wav"), wav, sr)


def _run_from_artifact(artifact_path: str, img_folder: str, num_samples: int,
                       start_idx: int, class_names: list[str], force_batch: bool = False,
                       audio_dir: str | None = None, audio_out_sr: int | None = None):
    """Generate from an exported StableHLO sampler (cli.export_model) — no
    checkpoint, config, or model code; the artifact froze sampler/steps/CFG.
    Its label batch must be k·num_classes so the per-class naming contract
    ({class}_gen_imgs_{i}_{samp}.png) holds."""
    from spectrogramgenai_tpu.audio.export import save_generated_pngs
    from spectrogramgenai_tpu.core.limits import check_sampling_label_batch
    from spectrogramgenai_tpu.serving.export import load_artifact

    art = load_artifact(artifact_path)
    check_sampling_label_batch(art.num_labels, force=force_batch)
    ncls = art.manifest["num_classes"]
    if len(class_names) != ncls:
        raise ValueError(f"artifact has {ncls} classes, got {len(class_names)} names")
    if art.num_labels % ncls:
        raise ValueError(f"artifact label batch {art.num_labels} is not a "
                         f"multiple of num_classes {ncls}")
    rounds_per_chain = art.num_labels // ncls
    labels = np.tile(np.arange(ncls, dtype=np.int32), rounds_per_chain)

    os.makedirs(img_folder, exist_ok=True)
    samp_i = start_idx
    remaining = num_samples
    while remaining > 0:
        k = min(rounds_per_chain, remaining)
        imgs = np.asarray(art(samp_i, labels))[: k * ncls]  # one device→host copy
        out_paths = [
            os.path.join(img_folder, f"{class_names[i]}_gen_imgs_{i}_{samp_i + r}.png")
            for r in range(k)
            for i in range(ncls)
        ]
        save_generated_pngs(imgs, out_paths)
        if audio_dir:
            _write_audio(imgs, out_paths, audio_dir, audio_out_sr)
        print(f"sample rounds {samp_i}..{samp_i + k - 1}: wrote {k * ncls} images")
        samp_i += k
        remaining -= k


def _dump_denoise_trajectory(task, state, labels, class_names, out_dir, use_ema):
    """Latent 2×2-grid + decoded dumps every 50 steps (diff_modules.py:661-700)."""
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.export import save_generated_png
    from spectrogramgenai_tpu.diffusion.ddpm import ddpm_sample
    from spectrogramgenai_tpu.models.vqvae import VQVAE

    params = state.ema_params if use_ema else state.params
    schedule = task.schedule

    def callback(i, x):
        return x  # collect every step; filter on host

    x_final, traj = jax.jit(
        lambda p, k: ddpm_sample(
            task._apply, p, schedule, k, labels,
            (task.sample_size, task.sample_size, task.channels),
            cfg_scale=task.cfg.cfg_scale, callback=callback,
        )
    )(params, jax.random.PRNGKey(0))

    steps = np.arange(schedule.noise_steps - 1, 0, -1)
    want = {int(s) for s in steps if s % 50 == 0 or s == 1 or s == schedule.noise_steps - 1}
    for pos, i in enumerate(steps):
        if int(i) not in want:
            continue
        x = np.asarray(jnp.clip(traj[pos], -1, 1))
        for img_i, lab in zip(x, np.asarray(labels)):
            # 2×2 grid of the 4 latent channels
            grid = np.block([[img_i[:, :, 0], img_i[:, :, 1]], [img_i[:, :, 2], img_i[:, :, 3]]])
            grid_u8 = ((grid + 1) / 2 * 255).astype(np.uint8)
            save_generated_png(grid_u8[..., None],
                               os.path.join(out_dir, f"{class_names[lab]}_noise_{int(i)}_latent.png"))
        if task.vqvae is not None:
            dec = task.vqvae.apply(task.vq_variables, jnp.asarray(x), method=VQVAE.decode_quantized)
            dec = ((np.asarray(jnp.clip(dec, -1, 1)) + 1) / 2 * 255).astype(np.uint8)
            for img_u8, lab in zip(dec, np.asarray(labels)):
                save_generated_png(img_u8,
                                   os.path.join(out_dir, f"{class_names[lab]}_noise_{int(i)}_decode.png"))


def main(argv=None):
    from spectrogramgenai_tpu.core.config import DDPMConfig, add_config_args, apply_overrides

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_folder", default="gen_images")
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--sav_denoise_path", default=None)
    p.add_argument("--use_ema", type=int, default=0)
    p.add_argument("--sampler", default="ddpm", choices=["ddpm", "ddim", "dpmpp"],
                   help="ddpm = reference-parity 999-step chain; ddim = fast 1st-order "
                        "sampler; dpmpp = DPM-Solver++(2M), 2nd-order (~20 steps)")
    p.add_argument("--num_steps", type=int, default=50, help="DDIM/DPM-Solver++ steps")
    p.add_argument("--artifact", default=None,
                   help="generate from an exported StableHLO sampler "
                        "(cli.export_model) instead of a checkpoint")
    p.add_argument("--force_batch", action="store_true",
                   help="override the measured-safe TPU label-batch bound "
                        "(core/limits.py; ≥81 labels crashes the axon worker)")
    p.add_argument("--train_folder_for_classes", default=None,
                   help="derive class names from this folder's subdirs")
    p.add_argument("--audio_dir", default=None,
                   help="also reconstruct each sample to WAV (Griffin-Lim "
                        "inversion, same as cli.spec_to_wav) into this folder")
    p.add_argument("--audio_out_sr", type=int, default=None,
                   help="resample reconstructed audio (e.g. 48000 for CLAP FAD)")
    add_config_args(p, DDPMConfig)
    a = p.parse_args(argv)
    cfg = apply_overrides(DDPMConfig(), a)

    if a.train_folder_for_classes:
        from spectrogramgenai_tpu.data.manifest import class_names_from_folder

        class_names = class_names_from_folder(a.train_folder_for_classes)
    else:
        class_names = [f"class{i:02d}" for i in range(cfg.num_classes)]

    run(cfg, a.img_folder, a.num_samples, a.start_idx, class_names,
        a.sav_denoise_path, bool(a.use_ema), a.sampler, a.num_steps,
        artifact=a.artifact, force_batch=a.force_batch,
        audio_dir=a.audio_dir, audio_out_sr=a.audio_out_sr)


if __name__ == "__main__":
    main()
