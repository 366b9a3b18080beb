"""Decompose the reverse-chain step cost vs internal batch size.

Hunts the sampler batch-scaling regression (r2: 27 labels → 1.41 samples/s
but 54 labels → 1.33; the attention kernel itself scales SUB-linearly, so
something else in the step grows super-linearly past internal batch ~54).

Times, at several internal batches B (= 2× labels with CFG):
  1. the full jitted chain, per-step (short scan so it finishes fast),
  2. the UNet forward alone (the scan body minus the ancestral update),
  3. every UNet sub-block standalone at its exact chain shape
     (DoubleConv / Down / Up / SA / bottleneck / outc),
  4. the ancestral-update elementwise tail,
  5. the one-off VQ quantize+decode.

Per-B times are printed normalized by B (ms per 54-internal-equivalent) so a
flat column = linear scaling; a growing column names the super-linear op.

Run on the real TPU:  python tools/sampler_microbench.py
  [--batches 28,54,80,108] [--steps 20]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


from spectrogramgenai_tpu.utils.benchtools import timeit_device as timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="28,54,80,108",
                    help="internal batches (2× labels); keep ≤108 unless off-axon")
    ap.add_argument("--steps", type=int, default=20, help="chain steps to time")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from spectrogramgenai_tpu.core.config import DDPMConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.models.layers import DoubleConv, Down, SpatialSelfAttention, Up
    from spectrogramgenai_tpu.models.vqvae import VQVAE
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask

    import dataclasses

    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16
    cfg = DDPMConfig(img_size=256, latent=True, run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    vq = VQVAE(latent_dim=cfg.latent_dim, dtype=dt)
    vq_vars = vq.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 256, 256, 1)))

    rng = np.random.default_rng(0)
    rows: dict[str, dict[int, float]] = {}

    def record(name, b, seconds):
        rows.setdefault(name, {})[b] = seconds

    # ---- 1+2: full chain per-step and UNet fwd, per internal batch ----------
    chain_cfg = dataclasses.replace(cfg, noise_steps=args.steps + 1)
    task = DiffusionTask(chain_cfg, mesh, total_steps=100, vq_variables=vq_vars)
    state = task.init_state(0)
    fwd = jax.jit(task._apply_sample)
    for b in batches:
        labels = jnp.arange(b // 2, dtype=jnp.int32) % cfg.num_classes
        sampler = task.make_sampler()
        f = functools.partial(sampler, state.params, jax.random.PRNGKey(0), labels,
                              cfg_scale=cfg.cfg_scale)
        record("chain_per_step", b, timeit(f, iters=max(2, args.iters // 2)) / args.steps)

        x = jnp.asarray(rng.standard_normal((b, 64, 64, cfg.latent_dim)), jnp.float32)
        t = jnp.full((b,), 500.0)
        y = jnp.arange(b, dtype=jnp.int32) % cfg.num_classes
        mask = jnp.ones((b,))
        record("unet_fwd", b, timeit(fwd, state.params, x, t, y, mask, iters=args.iters))

    # ---- 3: standalone sub-blocks at their exact chain shapes ---------------
    # (name, module factory, input HWC, needs t_emb, skip HWC or None)
    blocks = [
        ("inc DC(4→64)@64²",    lambda: DoubleConv(64, dtype=dt),        (64, 64, 4),    False, None),
        ("down1(64→128)@→32²",  lambda: Down(64, 128, dtype=dt),         (64, 64, 64),   True,  None),
        ("sa0 SA(128)@32²",     lambda: SpatialSelfAttention(128, fused=on_tpu, dtype=dt), (32, 32, 128), False, None),
        ("down2(128→256)@→16²", lambda: Down(128, 256, dtype=dt),        (32, 32, 128),  True,  None),
        ("sa1 SA(256)@16²",     lambda: SpatialSelfAttention(256, fused=on_tpu, dtype=dt), (16, 16, 256), False, None),
        ("down3(256→256)@→8²",  lambda: Down(256, 256, dtype=dt),        (16, 16, 256),  True,  None),
        ("sa2 SA(256)@8²",      lambda: SpatialSelfAttention(256, fused=on_tpu, dtype=dt), (8, 8, 256),   False, None),
        ("bot DC(256→512)@8²",  lambda: DoubleConv(512, dtype=dt),       (8, 8, 256),    False, None),
        ("bot DC(512→512)@8²",  lambda: DoubleConv(512, dtype=dt),       (8, 8, 512),    False, None),
        ("bot DC(512→256)@8²",  lambda: DoubleConv(256, dtype=dt),       (8, 8, 512),    False, None),
        ("up1(512→128)@→16²",   lambda: Up(512, 128, dtype=dt),          (8, 8, 256),    True,  (16, 16, 256)),
        ("sa3 SA(128)@16²",     lambda: SpatialSelfAttention(128, fused=on_tpu, dtype=dt), (16, 16, 128), False, None),
        ("up2(256→64)@→32²",    lambda: Up(256, 64, dtype=dt),           (16, 16, 128),  True,  (32, 32, 128)),
        ("sa4 SA(64)@32²",      lambda: SpatialSelfAttention(64, fused=on_tpu, dtype=dt),  (32, 32, 64),  False, None),
        ("up3(128→64)@→64²",    lambda: Up(128, 64, dtype=dt),           (32, 32, 64),   True,  (64, 64, 64)),
        ("sa5 SA(64)@64²",      lambda: SpatialSelfAttention(64, fused=on_tpu, dtype=dt),  (64, 64, 64),  False, None),
    ]
    for name, factory, in_hwc, needs_t, skip_hwc in blocks:
        mod = factory()
        bx = max(batches)
        x0 = jnp.asarray(rng.standard_normal((bx, *in_hwc)), jnp.float32)
        extra = []
        if skip_hwc is not None:
            extra.append(jnp.asarray(rng.standard_normal((bx, *skip_hwc)), jnp.float32))
        if needs_t:
            extra.append(jnp.asarray(rng.standard_normal((bx, 256)), jnp.float32))
        variables = mod.init(jax.random.PRNGKey(0), x0[:1], *[e[:1] for e in extra])
        run = jax.jit(lambda v, x, *e: mod.apply(v, x, *e))
        for b in batches:
            record(name, b, timeit(run, variables, x0[:b], *[e[:b] for e in extra],
                                   iters=args.iters))

    # ---- 4: ancestral-update elementwise tail -------------------------------
    @jax.jit
    def anc_update(x, eps_cond, eps_uncond, noise):
        eps = eps_uncond + 3.0 * (eps_cond - eps_uncond)
        return (1.0 / jnp.sqrt(0.99)) * (x - (0.01 / jnp.sqrt(0.3)) * eps) + 0.1 * noise

    for b in batches:
        n = b // 2
        sh = (n, 64, 64, cfg.latent_dim)
        xs = [jnp.asarray(rng.standard_normal(sh), jnp.float32) for _ in range(4)]
        record("ancestral_update", b, timeit(anc_update, *xs, iters=args.iters))

    # ---- 5: VQ quantize+decode (once per chain) -----------------------------
    dec = jax.jit(lambda v, z: vq.apply(v, z, method=VQVAE.decode_quantized))
    for b in batches:
        z = jnp.asarray(rng.standard_normal((b // 2, 64, 64, cfg.latent_dim)), jnp.float32)
        record("vq_decode(once)", b, timeit(dec, vq_vars, z, iters=args.iters))

    # ---- report: ms, normalized to B=ref so linear scaling reads flat -------
    ref = batches[0]
    hdr = "  ".join(f"B{b:>4}" for b in batches)
    hdr2 = "  ".join(f"x{b / ref:>4.2f}" for b in batches)
    print(f"\n{'component':24s}  {hdr}   | per-B-normalized (flat = linear)")
    print(f"{'':24s}  {hdr2}")
    for name, times in rows.items():
        ms = "  ".join(f"{times[b] * 1e3:5.1f}" for b in batches)
        norm = "  ".join(f"{times[b] / times[ref] / (b / ref):5.2f}" for b in batches)
        print(f"{name:24s}  {ms}   | {norm}")


if __name__ == "__main__":
    main()
