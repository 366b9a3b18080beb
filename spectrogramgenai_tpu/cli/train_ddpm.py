"""Conditional DDPM trainer CLI (rebuild of reference train_ddpm.py — fixed:
the reference entry point crashes on a nonexistent import, SURVEY.md §7).

Pixel-space (``--latent false``) or VQ-VAE-latent diffusion. The latent path
loads a trained VQ-VAE checkpoint (cli/train_vqvae.py output).

  python -m spectrogramgenai_tpu.cli.train_ddpm --data.dataset_path datasets \
      --epochs 100 --latent true --vqae_ckpt models/vqvae
"""

from __future__ import annotations

import os

import numpy as np


def load_vq_variables(ckpt_dir: str, cfg):
    """Restore a trained VQ-VAE (full TrainState checkpoint) → variables dict."""
    import jax

    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.core.config import VQVAEConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.train.vqvae_task import VQVAETask

    vq_cfg = VQVAEConfig(hidden_dim=cfg.vq_hidden_dim, latent_dim=cfg.latent_dim,
                         n_embeddings=cfg.vq_n_embeddings)
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = VQVAETask(vq_cfg, mesh)
    template = task.init_state(img_size=cfg.img_size)
    restored = CheckpointManager(ckpt_dir).restore(template)
    if restored is None:
        raise FileNotFoundError(f"no VQ-VAE checkpoint under {ckpt_dir}")
    return task.variables(restored)


def run(cfg):
    import jax

    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.core.metrics import MetricsLogger
    from spectrogramgenai_tpu.data.pipeline import ImageFolderSource, device_prefetch, iterate_batches
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask

    from spectrogramgenai_tpu.cli.common import setup

    setup(cfg.run)
    mesh = create_mesh(MeshSpec(cfg.run.mesh_data, cfg.run.mesh_model))

    train_src = ImageFolderSource(
        os.path.join(cfg.data.dataset_path, cfg.data.train_folder),
        bootstrap_balance=cfg.data.bootstrap_balance, seed=cfg.run.seed, img_size=cfg.data.img_size,
        cache_decoded=cfg.data.cache_decoded, cache_budget_mb=cfg.data.cache_budget_mb,
    )
    steps_per_epoch = len(train_src.epoch_indices()) // cfg.data.batch_size
    total_steps = max(1, steps_per_epoch * cfg.epochs)

    vq_vars = load_vq_variables(cfg.vqae_ckpt, cfg) if cfg.latent else None
    task = DiffusionTask(cfg, mesh, total_steps=total_steps, vq_variables=vq_vars)
    state = task.init_state()
    use_cache = cfg.latent and cfg.cache_latents
    if use_cache:
        # Pre-encode the dataset once (frozen deterministic encoder) and
        # train from cached latents: identical batches and updates, minus
        # the in-step encode and all per-epoch PNG decode. epoch_indices()
        # delegates to train_src, so the shuffle/bootstrap stream (and exact
        # mid-epoch resume) is unchanged.
        from spectrogramgenai_tpu.data.latent_cache import LatentCacheSource

        train_src = LatentCacheSource(train_src, task.make_encoder())
    batch_key = "latent" if use_cache else "image"
    train_step = task.make_train_step(encoded=use_cache)
    eval_step = task.make_eval_step()

    run_dir = os.path.join(cfg.run.output_dir, cfg.run.run_name)
    logger = MetricsLogger(run_dir, use_wandb=cfg.run.use_wandb)
    ckpt = CheckpointManager(os.path.join("models", cfg.run.run_name))

    try:
        restored = ckpt.restore(state)
    except Exception as e:  # incompatible/old checkpoint format
        print(f"warning: could not restore checkpoint ({type(e).__name__}); starting fresh")
        restored = None
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")
    # Exact mid-epoch resume: state.step counts consumed train batches, so it
    # is the full resume position. Skipped epochs still consume
    # train_src.epoch_indices() (same source seed → same shuffle/bootstrap
    # stream), and the first partial epoch skips its already-trained batches
    # without decoding — the run continues on the identical remaining stream
    # instead of re-training from epoch 0 (and overrunning the OneCycle
    # schedule), which is what a naive epoch-granular restart would do.
    start_epoch = min(int(state.step) // steps_per_epoch, cfg.epochs) if steps_per_epoch else 0
    resume_skip = int(state.step) % steps_per_epoch if steps_per_epoch else 0

    val_root = os.path.join(cfg.data.dataset_path, cfg.data.val_folder)
    val_src = ImageFolderSource(val_root, img_size=cfg.data.img_size,
                                cache_decoded=cfg.data.cache_decoded,
                                cache_budget_mb=cfg.data.cache_budget_mb) if os.path.isdir(val_root) else None

    step_i = int(state.step)
    for epoch in range(cfg.epochs):
        if epoch < start_epoch:
            train_src.epoch_indices()  # advance the shuffle/bootstrap RNG stream
            continue
        skip = resume_skip if epoch == start_epoch else 0
        for batch in device_prefetch(
            iterate_batches(train_src, cfg.data.batch_size, epochs=1, skip_batches=skip), mesh
        ):
            state, m = train_step(state, batch[batch_key], batch["label"])
            step_i += 1
            if step_i % cfg.run.log_every == 0:
                logger.log(step_i, epoch=epoch, train_mse=float(m["train_mse"]))
        if cfg.do_validation and val_src is not None:
            from spectrogramgenai_tpu.data.pipeline import padded_eval_batches

            vals = []
            key = jax.random.PRNGKey(epoch)
            for batch, _n in padded_eval_batches(val_src, 2 * cfg.data.batch_size, mesh):
                vals.append(float(eval_step(state, batch["image"], batch["label"], key)["val_mse"]))
            if vals:
                logger.log(step_i, epoch=epoch, val_mse=float(np.mean(vals)))
        if epoch % cfg.log_every_epoch == 0 or epoch == cfg.epochs - 1:
            _log_images(task, state, run_dir, epoch, logger=logger, step=step_i)
        if epoch % cfg.run.ckpt_every_epochs == 0 or epoch == cfg.epochs - 1:
            saved_dir = ckpt.save(step_i, state)
            # wandb Artifact parity (diff_modules.py:513-523); no-op w/o wandb
            logger.log_artifact(saved_dir, name="model",
                                description="Model weights for DDPM conditional",
                                metadata={"epoch": epoch})
    print(f"done; checkpoints under models/{cfg.run.run_name}")
    return state


def _log_images(task, state, run_dir: str, epoch: int, logger=None, step: int = 0):
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.export import save_generated_png

    labels = jnp.arange(task.cfg.num_classes, dtype=jnp.int32)
    imgs = np.asarray(task.sample(state, jax.random.PRNGKey(epoch), labels,
                                  sampler=task.cfg.preview_sampler))
    out = os.path.join(run_dir, f"samples_epoch_{epoch:04d}")
    for i, img in enumerate(imgs):
        save_generated_png(img, os.path.join(out, f"class_{i:02d}.png"))
    if logger is not None:
        # wandb sampled-image panel parity (diff_modules.py:482-487); the
        # PNGs above are the offline record, this is a one-row class strip
        logger.log_images(step, {"sampled_classes": np.concatenate(imgs[..., 0], axis=1)})


def main(argv=None):
    import argparse

    from spectrogramgenai_tpu.core.config import DDPMConfig, add_config_args, apply_overrides

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the run (TensorBoard/xprof)")
    add_config_args(p, DDPMConfig)
    a = p.parse_args(argv)
    cfg = apply_overrides(DDPMConfig(), a)

    from spectrogramgenai_tpu.utils.profiling import trace

    with trace(a.profile_dir):
        run(cfg)


if __name__ == "__main__":
    main()
