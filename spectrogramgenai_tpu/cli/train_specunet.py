"""Source-separation trainer CLI (reference helpers.train_specunet).

Consumes MixDataset-style manifests: a noise-recordings CSV and a
bird-recordings CSV (columns: path, st, common_name), builds ε-mixed
spectrogram triples on the fly (audio/mix.py), and trains the 2-channel
separator with MSE. Writes separation-example plots and periodic checkpoints.

  python -m spectrogramgenai_tpu.cli.train_specunet --noise_csv noise.csv \
      --bird_csv birds.csv --sample_rate 22050 --epochs 100
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd


def make_mix_batches(noise_df, bird_df, sr: int, batch_size: int, seed: int, use_pallas: bool):
    """Yield dict batches of midpoint-normalized (noise, bird, mix) spec triples."""
    from spectrogramgenai_tpu.audio.mix import mix_batch_specs
    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig
    from spectrogramgenai_tpu.audio.wavio import fixed_window, load_wav

    rng = np.random.default_rng(seed)
    cfg = SpectrogramConfig(sample_rate=sr)
    n = min(len(noise_df), len(bird_df))
    order = rng.permutation(n)
    win = 2**17  # MixDataset window (helpers.py:226)

    for start in range(0, n - batch_size + 1, batch_size):
        idx = order[start : start + batch_size]
        noise_wavs, bird_wavs, labels = [], [], []
        for i in idx:
            nr, br = noise_df.iloc[i], bird_df.iloc[i]
            nw, _ = load_wav(nr["path"], target_sr=sr)
            bw, _ = load_wav(br["path"], target_sr=sr)
            noise_wavs.append(fixed_window(nw, sr, float(br.get("st", 0.0)), win))
            bird_wavs.append(fixed_window(bw, sr, float(br.get("st", 0.0)), win))
            labels.append(br.get("common_name", ""))
        eps = rng.uniform(0.0, 0.3, size=batch_size)
        noise_s, bird_s, mix_s = mix_batch_specs(
            np.stack(noise_wavs), np.stack(bird_wavs), eps, cfg, use_pallas=use_pallas
        )
        # (B, n_mels, num_frames) → NHWC
        yield {
            "noise": noise_s[..., None],
            "bird": bird_s[..., None],
            "mix": mix_s[..., None],
            "labels": labels,
        }


def run(args):

    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh, shard_batch
    from spectrogramgenai_tpu.core.metrics import MetricsLogger
    from spectrogramgenai_tpu.train.specunet_task import SpecUNetTask

    cfg = args.cfg
    from spectrogramgenai_tpu.cli.common import setup

    setup(cfg.run)
    mesh = create_mesh(MeshSpec(cfg.run.mesh_data, cfg.run.mesh_model))
    task = SpecUNetTask(cfg, mesh)
    state = task.init_state(img_size=256)
    step = task.make_train_step()

    run_dir = os.path.join(cfg.run.output_dir, cfg.run.run_name)
    logger = MetricsLogger(run_dir)
    ckpt = CheckpointManager(os.path.join("models", cfg.run.run_name))

    noise_df = pd.read_csv(args.noise_csv)
    bird_df = pd.read_csv(args.bird_csv)

    step_i = 0
    for epoch in range(cfg.epochs):
        for batch in make_mix_batches(noise_df, bird_df, args.sample_rate,
                                      cfg.data.batch_size, cfg.run.seed + epoch, args.use_pallas):
            sharded = shard_batch(mesh, {k: batch[k] for k in ("noise", "bird", "mix")})
            state, m = step(state, sharded["mix"], sharded["noise"], sharded["bird"])
            step_i += 1
            if step_i % cfg.run.log_every == 0:
                logger.log(step_i, epoch=epoch, train_mse=float(m["train_mse"]))
        if epoch % cfg.run.ckpt_every_epochs == 0 or epoch == cfg.epochs - 1:
            ckpt.save(step_i, state)
            _plot_separation(task, state, batch, run_dir, epoch)
    return state


def _plot_separation(task, state, batch, run_dir: str, epoch: int):
    """5-column separation example plot (reference plot_sep, helpers.py:1217-1250)."""
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pred_noise, pred_bird = task.separate(state, jnp.asarray(batch["mix"][:4]))
    fig, axes = plt.subplots(4, 5, figsize=(15, 10))
    cols = [batch["mix"], batch["noise"], np.asarray(pred_noise),
            batch["bird"], np.asarray(pred_bird)]
    titles = ["mix", "noise", "pred noise", "bird", "pred bird"]
    for r in range(min(4, len(batch["mix"]))):
        for c in range(5):
            axes[r, c].imshow(np.squeeze(cols[c][r]), origin="lower", cmap="viridis")
            axes[r, c].axis("off")
            if r == 0:
                axes[r, c].set_title(titles[c])
    fig.tight_layout()
    fig.savefig(os.path.join(run_dir, f"sep_examples_epoch_{epoch:03d}.png"), dpi=120)
    plt.close(fig)


def main(argv=None):
    from spectrogramgenai_tpu.core.config import SpecUNetConfig, add_config_args, apply_overrides

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--noise_csv", required=True)
    p.add_argument("--bird_csv", required=True)
    p.add_argument("--sample_rate", type=int, default=22050)
    p.add_argument("--use_pallas", type=int, default=1)
    add_config_args(p, SpecUNetConfig)
    a = p.parse_args(argv)
    a.cfg = apply_overrides(SpecUNetConfig(), a)
    a.use_pallas = bool(a.use_pallas)
    run(a)


if __name__ == "__main__":
    main()
