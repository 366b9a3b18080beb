"""Export a trained DDPM sampler to a self-contained StableHLO artifact.

Production-deployment capability beyond the reference (whose checkpoints are
source-coupled state_dicts, diff_modules.py:512-546): the artifact bakes in
weights + schedule + CFG + VQ decode and needs only `serving.export
.load_artifact` (no model code) to generate — see serving/export.py.

  python -m spectrogramgenai_tpu.cli.export_model --run.run_name ddpm \
      --vqae_ckpt models/vqvae --out models/ddpm_sampler.shlo \
      --num_labels 27 [--check]

Default sampler is DPM-Solver++(2M) at 20 steps (the serving production
path); pass --sampler ddpm for the reference's 999-step parity chain.
"""

from __future__ import annotations

import argparse
import os


def run(cfg, *, out: str, num_labels: int, sampler: str, num_steps: int,
        use_ema: bool, platforms: list[str] | None, check: bool):
    from spectrogramgenai_tpu.cli.train_ddpm import load_vq_variables
    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.serving.export import export_sampler, load_artifact, save_artifact
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask

    mesh = create_mesh(MeshSpec(cfg.run.mesh_data, cfg.run.mesh_model))
    vq_vars = load_vq_variables(cfg.vqae_ckpt, cfg) if cfg.latent else None
    task = DiffusionTask(cfg, mesh, total_steps=1, vq_variables=vq_vars)
    state = task.init_state()
    restored = CheckpointManager(os.path.join("models", cfg.run.run_name)).restore(state)
    if restored is None:
        raise FileNotFoundError(f"no DDPM checkpoint under models/{cfg.run.run_name}")

    blob = export_sampler(task, restored, num_labels=num_labels, use_ema=use_ema,
                          sampler=sampler, num_steps=num_steps, platforms=platforms)
    save_artifact(out, blob)
    print(f"exported {sampler} sampler ({num_labels} labels) → {out} "
          f"({len(blob) / 1e6:.1f} MB)")

    if check:
        import numpy as np

        art = load_artifact(out)
        imgs = art(0, np.arange(num_labels, dtype=np.int32) % cfg.num_classes)
        print(f"check: artifact generated {imgs.shape} {imgs.dtype}")
    return out


def main(argv=None):
    from spectrogramgenai_tpu.cli.common import setup
    from spectrogramgenai_tpu.core.config import DDPMConfig, add_config_args, apply_overrides

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="models/ddpm_sampler.shlo")
    p.add_argument("--num_labels", type=int, default=27)
    p.add_argument("--sampler", default="dpmpp", choices=["ddpm", "ddim", "dpmpp"],
                   help="dpmpp = DPM-Solver++(2M), the serving default; "
                        "ddpm = the reference 999-step parity chain")
    p.add_argument("--num_steps", type=int, default=None,
                   help="DDIM/DPM-Solver++ steps (default: 20 for dpmpp, 50 for ddim)")
    p.add_argument("--use_ema", type=int, default=0)
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets (default: current backend), "
                        "e.g. tpu,cpu for a multi-platform artifact")
    p.add_argument("--check", action="store_true", help="deserialize + run once")
    add_config_args(p, DDPMConfig)
    a = p.parse_args(argv)
    cfg = apply_overrides(DDPMConfig(), a)
    setup(cfg.run)
    platforms = a.platforms.split(",") if a.platforms else None
    num_steps = a.num_steps if a.num_steps else (20 if a.sampler == "dpmpp" else 50)
    run(cfg, out=a.out, num_labels=a.num_labels, sampler=a.sampler,
        num_steps=num_steps, use_ema=bool(a.use_ema), platforms=platforms,
        check=a.check)


if __name__ == "__main__":
    main()
