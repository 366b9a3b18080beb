"""Generation serving CLI: load a DDPM checkpoint, serve batched requests.

Capability beyond the reference (its generation is offline-only,
ddpm_conditional_generate.py): a dynamic-batching HTTP service around the
jitted sampler. Concurrent POST /generate requests coalesce into fixed-shape
reverse-diffusion chains (no retraces; see serving/server.py for the design).

  python -m spectrogramgenai_tpu.cli.serve --run.run_name ddpm \
      --vqae_ckpt models/vqvae --port 8000 --serve_batch 27 \
      --train_folder_for_classes datasets/train

Default sampler is DPM-Solver++(2M) at 20 steps — 2.5× the DDIM-50 serving
throughput at matched ODE accuracy (see PARITY.md); pass --sampler ddim
--num_steps 50 (or ddpm for the 999-step parity chain) to override.

  curl -X POST localhost:8000/generate -d '{"label": "bird_a", "count": 2}'
  curl localhost:8000/stats
"""

from __future__ import annotations

import argparse
import os


def run(cfg, *, port: int, host: str, serve_batch: int, max_delay_ms: float,
        sampler: str, num_steps: int, use_ema: bool, class_names: list[str],
        warmup: bool = True, block: bool = True, artifact: str | None = None,
        force_batch: bool = False, audio_out_sr: int | None = None,
        audio_gl_iters: int = 32, warm_audio: bool = False):
    from spectrogramgenai_tpu.serving import (AudioReconstructor, BatchingSampler,
                                              GenerationHTTPServer)

    if artifact:
        # serve an exported StableHLO artifact — no checkpoint/model code
        from spectrogramgenai_tpu.serving.export import load_artifact

        art = load_artifact(artifact)
        batcher = BatchingSampler.from_artifact(art, max_delay_ms=max_delay_ms,
                                                force_batch=force_batch)
        serve_batch, sampler = art.num_labels, art.manifest["sampler"]
    else:
        from spectrogramgenai_tpu.cli.train_ddpm import load_vq_variables
        from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
        from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
        from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask

        mesh = create_mesh(MeshSpec(cfg.run.mesh_data, cfg.run.mesh_model))
        vq_vars = load_vq_variables(cfg.vqae_ckpt, cfg) if cfg.latent else None
        task = DiffusionTask(cfg, mesh, total_steps=1, vq_variables=vq_vars)
        state = task.init_state()
        restored = CheckpointManager(os.path.join("models", cfg.run.run_name)).restore(state)
        if restored is None:
            raise FileNotFoundError(f"no DDPM checkpoint under models/{cfg.run.run_name}")
        state = restored

        batcher = BatchingSampler(task, state, batch_size=serve_batch,
                                  max_delay_ms=max_delay_ms, sampler=sampler,
                                  num_steps=num_steps, use_ema=use_ema,
                                  force_batch=force_batch)
    audio_rec = AudioReconstructor(gl_iters=audio_gl_iters, out_sr=audio_out_sr)
    if warmup:
        # compile the fixed-shape chain before accepting traffic
        print(f"serve: warming up ({sampler}, batch {serve_batch})…", flush=True)
        img = batcher.submit(0, 1).result()
        if warm_audio:
            print("serve: warming audio inversion…", flush=True)
            audio_rec.warmup(img.shape[1], img.shape[2], counts=(1,))
        print("serve: warmup done", flush=True)

    server = GenerationHTTPServer(batcher, class_names, host=host, port=port,
                                  audio=audio_rec)
    print(f"serve: listening on {host}:{server.port} "
          f"(batch {serve_batch}, window {max_delay_ms}ms, {sampler})", flush=True)
    if block:
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.shutdown()
            batcher.close()
    else:
        server.start()  # background handler thread; caller owns shutdown()
    return server, batcher


def main(argv=None):
    from spectrogramgenai_tpu.cli.common import setup
    from spectrogramgenai_tpu.core.config import DDPMConfig, add_config_args, apply_overrides

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--serve_batch", type=int, default=27,
                   help="compiled label-batch per chain (27 → internal 54 with CFG, "
                        "the measured v5e sweet spot)")
    p.add_argument("--max_delay_ms", type=float, default=50.0,
                   help="dynamic-batching coalescing window")
    p.add_argument("--sampler", default="dpmpp", choices=["ddpm", "ddim", "dpmpp"],
                   help="dpmpp = DPM-Solver++(2M), the serving default "
                        "(2.5x DDIM-50 throughput); ddpm = 999-step parity chain")
    p.add_argument("--num_steps", type=int, default=None,
                   help="DDIM/DPM-Solver++ steps (default: 20 for dpmpp, 50 for ddim)")
    p.add_argument("--use_ema", type=int, default=0)
    p.add_argument("--artifact", default=None,
                   help="serve an exported StableHLO sampler (cli.export_model) "
                        "instead of a checkpoint; overrides batch/sampler args")
    p.add_argument("--force_batch", action="store_true",
                   help="override the measured-safe TPU label-batch bound "
                        "(core/limits.py; ≥81 labels crashes the axon worker)")
    p.add_argument("--train_folder_for_classes", default=None)
    p.add_argument("--audio_out_sr", type=int, default=None,
                   help='resample "audio": true responses (e.g. 48000 for CLAP)')
    p.add_argument("--audio_gl_iters", type=int, default=32,
                   help="Griffin-Lim iterations for audio reconstruction")
    p.add_argument("--warm_audio", action="store_true",
                   help="also compile the audio-inversion program at startup")
    add_config_args(p, DDPMConfig)
    a = p.parse_args(argv)
    cfg = apply_overrides(DDPMConfig(), a)
    setup(cfg.run)

    if a.train_folder_for_classes:
        from spectrogramgenai_tpu.data.manifest import class_names_from_folder

        class_names = class_names_from_folder(a.train_folder_for_classes)
    else:
        class_names = [f"class{i:02d}" for i in range(cfg.num_classes)]

    num_steps = a.num_steps if a.num_steps else (20 if a.sampler == "dpmpp" else 50)
    run(cfg, port=a.port, host=a.host, serve_batch=a.serve_batch,
        max_delay_ms=a.max_delay_ms, sampler=a.sampler, num_steps=num_steps,
        use_ema=bool(a.use_ema), class_names=class_names, artifact=a.artifact,
        force_batch=a.force_batch, audio_out_sr=a.audio_out_sr,
        audio_gl_iters=a.audio_gl_iters, warm_audio=a.warm_audio)


if __name__ == "__main__":
    main()
