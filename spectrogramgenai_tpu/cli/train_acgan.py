"""ACGAN trainer CLI (rebuild of reference train_acgan.py).

Image-folder input (each class a subdirectory) or specdata.npz+CSV manifest;
per-epoch results CSV with the reference's column schema
(Epoch, Loss_D, Loss_G, Loss_A — train_acgan.py:326-344); eval-noise sample
grids every `sample_every` batches; G/D checkpoints every 10 epochs with
resume (`--st_epochs`).

  python -m spectrogramgenai_tpu.cli.train_acgan --data.dataset_path datasets \
      --data.train_folder train --epochs 200
"""

from __future__ import annotations

import os

import numpy as np


def _manifest_source(cfg, manifest: str, lab_csv: str | None, ai_csv: str | None, im_path: str):
    """DataFrame-manifest mode (reference train_acgan.py:24,52-84): specdata.npz
    splits keyed by the label CSV's columns, optional acoustic-index merge with
    per-column z-normalization."""
    import pandas as pd

    from spectrogramgenai_tpu.data.manifest import load_specdata_manifest
    from spectrogramgenai_tpu.data.pipeline import DataFrameImageSource

    columns = None
    if lab_csv:
        columns = ["index0"] + list(pd.read_csv(lab_csv).columns)
    train_df, _test_df, classes = load_specdata_manifest(manifest, columns)

    indices_columns = None
    if cfg.use_aind and ai_csv:
        aind_df = pd.read_csv(ai_csv)
        indices_columns = ["ACI", "ADiv", "AEve", "BioA", "H", "Ht", "M",
                           "NDSI", "NDSIAnthro", "NDSIBio", "AR"]
        train_df = train_df.merge(
            aind_df,
            left_on=["file_name", "begin_time", "end_time"],
            right_on=["file_path", "begin_time", "end_time"],
        )
        for col in indices_columns:
            train_df[col] = (train_df[col] - train_df[col].mean()) / train_df[col].std(ddof=0)

    src = DataFrameImageSource(train_df, im_path, classes, indices_columns=indices_columns,
                               seed=cfg.run.seed, cache_decoded=cfg.data.cache_decoded,
                               cache_budget_mb=cfg.data.cache_budget_mb)
    return src, classes


def run(cfg, st_epochs: int = 0, manifest: str | None = None, lab_csv: str | None = None,
        ai_csv: str | None = None, im_path: str = "."):
    import jax

    from spectrogramgenai_tpu.audio.export import save_generated_png
    from spectrogramgenai_tpu.cli.common import setup
    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.core.metrics import MetricsLogger
    from spectrogramgenai_tpu.data.pipeline import ImageFolderSource, device_prefetch, iterate_batches
    from spectrogramgenai_tpu.train.acgan_task import ACGANTask

    setup(cfg.run)
    mesh = create_mesh(MeshSpec(cfg.run.mesh_data, cfg.run.mesh_model))
    task = ACGANTask(cfg, mesh)
    state = task.init_state()
    step = task.make_train_step()

    run_dir = os.path.join(cfg.run.output_dir, cfg.run.run_name)
    os.makedirs(run_dir, exist_ok=True)
    logger = MetricsLogger(run_dir, csv_name="training_results.csv",
                           csv_columns=["Epoch", "Loss_D", "Loss_G", "Loss_A"],
                           use_wandb=cfg.run.use_wandb)
    ckpt = CheckpointManager(os.path.join("models", cfg.run.run_name))
    if st_epochs > 0:
        st_epochs = 10 * (st_epochs // 10)  # train_acgan.py:138 rounding
        restored = ckpt.restore(state, step=st_epochs)
        if restored is not None:
            state = restored

    if manifest:
        src, _classes = _manifest_source(cfg, manifest, lab_csv, ai_csv, im_path)
    else:
        src = ImageFolderSource(
            os.path.join(cfg.data.dataset_path, cfg.data.train_folder),
            seed=cfg.run.seed, img_size=cfg.data.img_size,
            cache_decoded=cfg.data.cache_decoded, cache_budget_mb=cfg.data.cache_budget_mb,
        )

    # fixed eval noise (train_acgan.py:119-123)
    key = jax.random.PRNGKey(cfg.run.seed)
    eval_labels = jax.random.randint(key, (cfg.data.batch_size,), 0, cfg.num_classes)
    eval_noise = task.build_noise(jax.random.fold_in(key, 1), eval_labels)

    for epoch in range(st_epochs + 1, cfg.epochs):
        sums = {"loss_G": 0.0, "loss_D": 0.0, "d_acc": 0.0}
        n_batches = 0
        for i, batch in enumerate(
            device_prefetch(iterate_batches(src, cfg.data.batch_size, epochs=1), mesh)
        ):
            state, m = step(state, batch["image"], batch["label"],
                            batch.get("a_ind"))
            for k in sums:
                sums[k] += float(m[k])
            n_batches += 1
            if i % cfg.sample_every == 0:
                imgs = np.asarray(task.generate(state, eval_noise))
                grid = _image_grid(imgs)
                save_generated_png(grid[..., None],
                                   os.path.join(run_dir, f"fake_samples_epoch_{epoch:03d}.png"))
                print(f"[{epoch}/{cfg.epochs}][{i}] Loss_D: {m['loss_D']:.4f} "
                      f"Loss_G: {m['loss_G']:.4f} Acc: {m['d_acc']:.4f}")
        row = {k: v / max(1, n_batches) for k, v in sums.items()}
        logger.log(int(state.step), epoch=epoch, **row)
        logger.log_csv_row({"Epoch": epoch, "Loss_D": row["loss_D"],
                            "Loss_G": row["loss_G"], "Loss_A": row["d_acc"]})
        if epoch % 10 == 0 or epoch == cfg.epochs - 1:
            ckpt.save(epoch, state)
    return state


def _image_grid(imgs: np.ndarray, cols: int = 4) -> np.ndarray:
    """[-1,1] NHWC1 batch → uint8 grid (vutils.save_image capability)."""
    imgs = ((np.clip(imgs, -1, 1) + 1) / 2 * 255).astype(np.uint8)[..., 0]
    n, h, w = imgs.shape
    rows = -(-n // cols)
    grid = np.zeros((rows * h, cols * w), np.uint8)
    for i, img in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
    return grid


def main(argv=None):
    import argparse

    from spectrogramgenai_tpu.core.config import ACGANConfig, add_config_args, apply_overrides

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--st_epochs", type=int, default=0)
    p.add_argument("--manifest", default=None, help="specdata.npz (DataFrame mode)")
    p.add_argument("--lab_csv", default=None, help="label CSV providing the manifest's columns")
    p.add_argument("--ai_csv", default=None, help="acoustic-index CSV (with --use_aind true)")
    p.add_argument("--im_path", default=".", help="spectrogram image folder for DataFrame mode")
    add_config_args(p, ACGANConfig)
    a = p.parse_args(argv)
    run(apply_overrides(ACGANConfig(), a), a.st_epochs, a.manifest, a.lab_csv, a.ai_csv, a.im_path)


if __name__ == "__main__":
    main()
