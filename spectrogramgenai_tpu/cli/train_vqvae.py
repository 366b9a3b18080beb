"""VQ-VAE trainer CLI (rebuild of reference spec_vae.py).

  python -m spectrogramgenai_tpu.cli.train_vqvae --data.dataset_path datasets \
      --data.train_folder train --data.val_folder val --epochs 10
"""

from __future__ import annotations

import os

import numpy as np


def run(cfg):

    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.core.config import VQVAEConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.core.metrics import MetricsLogger
    from spectrogramgenai_tpu.data.pipeline import ImageFolderSource, device_prefetch, iterate_batches
    from spectrogramgenai_tpu.train.vqvae_task import VQVAETask

    from spectrogramgenai_tpu.cli.common import setup

    setup(cfg.run)
    mesh = create_mesh(MeshSpec(cfg.run.mesh_data, cfg.run.mesh_model))
    task = VQVAETask(cfg, mesh)
    state = task.init_state(img_size=cfg.data.img_size)
    train_step = task.make_train_step()
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
        print(f"resumed VQ-VAE from step {int(np.asarray(state.step))}")

    train_src = ImageFolderSource(
        os.path.join(cfg.data.dataset_path, cfg.data.train_folder),
        bootstrap_balance=cfg.data.bootstrap_balance, seed=cfg.run.seed, img_size=cfg.data.img_size,
        cache_decoded=cfg.data.cache_decoded, cache_budget_mb=cfg.data.cache_budget_mb,
    )
    val_root = os.path.join(cfg.data.dataset_path, cfg.data.val_folder)
    val_src = ImageFolderSource(val_root, img_size=cfg.data.img_size,
                                cache_decoded=cfg.data.cache_decoded,
                                cache_budget_mb=cfg.data.cache_budget_mb) if os.path.isdir(val_root) else None

    step_i = 0
    for epoch in range(cfg.epochs):
        it = device_prefetch(iterate_batches(train_src, cfg.data.batch_size, epochs=1), mesh)
        for batch in it:
            state, m = train_step(state, batch["image"])
            step_i += 1
            if step_i % cfg.run.log_every == 0:
                logger.log(step_i, epoch=epoch, **{k: float(v) for k, v in m.items()})
        if val_src is not None:
            from spectrogramgenai_tpu.data.pipeline import padded_eval_batches

            vals = []
            last_batch = None
            for batch, _n in padded_eval_batches(val_src, 2 * cfg.data.batch_size, mesh):
                vals.append({k: float(v) for k, v in eval_step(state, batch["image"]).items()})
                last_batch = batch
            mean = {k: float(np.mean([v[k] for v in vals])) for k in vals[0]} if vals else {}
            logger.log(step_i, epoch=epoch, **mean)
            print(f"epoch {epoch}: {mean}")
            if last_batch is not None:
                _plot_reconstructions(task, state, np.asarray(last_batch["image"][:8]), run_dir, epoch)
    ckpt.save(step_i, state)
    print(f"saved VQ-VAE to models/{cfg.run.run_name}")
    return state


def _plot_reconstructions(task, state, images: np.ndarray, run_dir: str, epoch: int):
    """4-row orig / z-grid / z_q-grid / recon plot (reference spec_vae.py
    plot_images_torch capability)."""
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x_hat, z, z_q = task.reconstruct(state, jnp.asarray(images))
    x_hat, z, z_q = np.asarray(x_hat), np.asarray(z), np.asarray(z_q)
    n = min(4, len(images))
    fig, axes = plt.subplots(4, n, figsize=(3 * n, 10))
    for i in range(n):
        z_grid = np.block([[z[i, :, :, 0], z[i, :, :, 1]], [z[i, :, :, 2], z[i, :, :, 3]]])
        zq_grid = np.block([[z_q[i, :, :, 0], z_q[i, :, :, 1]], [z_q[i, :, :, 2], z_q[i, :, :, 3]]])
        for r, img in enumerate((images[i, :, :, 0], z_grid, zq_grid, x_hat[i, :, :, 0])):
            ax = axes[r, i] if n > 1 else axes[r]
            ax.imshow(img, origin="lower", cmap="viridis")
            ax.axis("off")
    for r, title in enumerate(("original", "z (latent)", "z_q (quantized)", "reconstruction")):
        (axes[r, 0] if n > 1 else axes[r]).set_title(title, fontsize=9, loc="left")
    fig.tight_layout()
    fig.savefig(os.path.join(run_dir, f"recon_epoch_{epoch:03d}.png"), dpi=120)
    plt.close(fig)


def main(argv=None):
    from spectrogramgenai_tpu.core.config import VQVAEConfig, parse_config

    run(parse_config(VQVAEConfig, argv))


if __name__ == "__main__":
    main()
