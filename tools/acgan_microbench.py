"""Decompose the ACGAN train step (r2 bench: 9.6% MFU — where does it go?).

Times, at the reference batch (16) and a capacity batch:
  1. the full jitted two-optimizer train step (the bench number),
  2. G-step and D-step halves in isolation,
  3. plain forwards (G, D) and their fwd+bwd,
  4. every GeneratorBlock / D conv block standalone at its exact shape,
  5. spectral-norm overhead: D forward with power-iteration updates
     (train) vs frozen stats (eval) — the delta is the per-step
     power-iteration + re-normalization cost.

Run on the real TPU:  python tools/acgan_microbench.py [--batches 16,64]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


# single-leaf sync + pipelined timing live in ONE place now; r3 fixed the
# same tunnel artifact in three hand-rolled copies of this loop
from spectrogramgenai_tpu.utils.benchtools import timeit_device as timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,64")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from spectrogramgenai_tpu.core.config import ACGANConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.models.gan import CBAM, Discriminator, Generator, GeneratorBlock
    from spectrogramgenai_tpu.train.acgan_task import ACGANTask, bce, nll

    dt = jnp.bfloat16
    cfg = ACGANConfig(run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = ACGANTask(cfg, mesh)
    state = task.init_state(0)
    # non-donating jit of the same step: make_train_step donates the state,
    # which a repeated-args timing loop would feed back after deletion
    step = jax.jit(task._train_step)
    rng = np.random.default_rng(0)

    rows: dict[str, dict[int, float]] = {}

    def rec(name, b, s):
        rows.setdefault(name, {})[b] = s

    for b in batches:
        imgs = jnp.asarray(rng.uniform(0, 1, (b, 256, 256, 1)), jnp.float32)
        labs = jnp.zeros((b,), jnp.int32)
        z = task.build_noise(jax.random.PRNGKey(1), labs)
        valid = jnp.ones((b, 1), jnp.float32)

        rec("full_train_step", b, timeit(step, state, imgs, labs, iters=args.iters))

        # G / D forwards, eval vs train (train runs SN power iteration + BN)
        g_fwd_eval = jax.jit(lambda p, z: task.generator.apply(
            {"params": p, "batch_stats": state.g_stats}, z, train=False))
        g_fwd_train = jax.jit(lambda p, z: task.generator.apply(
            {"params": p, "batch_stats": state.g_stats}, z, train=True,
            mutable=["batch_stats"]))
        d_fwd_eval = jax.jit(lambda p, x: task.discriminator.apply(
            {"params": p, "batch_stats": state.d_stats}, x, train=False))
        d_fwd_train = jax.jit(lambda p, x: task.discriminator.apply(
            {"params": p, "batch_stats": state.d_stats}, x, train=True,
            mutable=["batch_stats"]))
        rec("G_fwd_eval", b, timeit(g_fwd_eval, state.g_params, z, iters=args.iters))
        rec("G_fwd_train(BN)", b, timeit(g_fwd_train, state.g_params, z, iters=args.iters))
        rec("D_fwd_eval", b, timeit(d_fwd_eval, state.d_params, imgs, iters=args.iters))
        rec("D_fwd_train(SN+BN)", b, timeit(d_fwd_train, state.d_params, imgs, iters=args.iters))

        # G-step alone (grad through G + frozen-D judge) and D-step alone
        def g_step_loss(gp, z):
            gen, _upd = task.generator.apply(
                {"params": gp, "batch_stats": state.g_stats}, z, train=True,
                mutable=["batch_stats"])
            rf, c = task.discriminator.apply(
                {"params": state.d_params, "batch_stats": state.d_stats}, gen, train=False)
            return 0.5 * (bce(rf, valid) + nll(c, labs))

        g_step = jax.jit(jax.grad(g_step_loss))
        rec("G_step_grad", b, timeit(g_step, state.g_params, z, iters=args.iters))

        def d_step_loss(dp, real, fake):
            outs_r, upd = task.discriminator.apply(
                {"params": dp, "batch_stats": state.d_stats}, real, train=True,
                mutable=["batch_stats"])
            outs_f, _ = task.discriminator.apply(
                {"params": dp, **upd}, fake, train=True, mutable=["batch_stats"])
            return 0.25 * (bce(outs_r[0], valid) + nll(outs_r[1], labs)
                           + bce(outs_f[0], 0 * valid) + nll(outs_f[1], labs))

        d_step = jax.jit(jax.grad(d_step_loss))
        fake = jnp.asarray(rng.uniform(-1, 1, (b, 256, 256, 1)), jnp.float32)
        rec("D_step_grad(2 passes)", b, timeit(d_step, state.d_params, imgs, fake,
                                               iters=args.iters))

        # standalone blocks (fwd only): where inside G/D the time sits
        gen_blocks = [(f"G block{i} ({512 // 2**i}→{512 // 2**(i + 1)})@{16 * 2**i}²",
                       GeneratorBlock(512 // 2**i, 512 // 2**(i + 1), dtype=dt),
                       (16 * 2**i, 16 * 2**i, 512 // 2**i)) for i in range(4)]
        gen_blocks.append(("G CBAM(32)@256²", CBAM(32, dtype=dt), (256, 256, 32)))
        for name, mod, hwc in gen_blocks:
            x0 = jnp.asarray(rng.standard_normal((b, *hwc)), jnp.float32)
            is_block = isinstance(mod, GeneratorBlock)
            kw = {"train": False} if is_block else {}
            variables = mod.init(jax.random.PRNGKey(0), x0[:1], **kw)
            f = jax.jit(lambda v, x, m=mod, kw=kw: m.apply(v, x, **kw))
            rec(name, b, timeit(f, variables, x0, iters=args.iters))

    ref = batches[0]
    hdr = "  ".join(f"B{b:>4}" for b in batches)
    print(f"\n{'component':28s}  {hdr}  (ms)")
    for name, times in rows.items():
        ms = "  ".join(f"{times.get(b, float('nan')) * 1e3:7.2f}" for b in batches)
        print(f"{name:28s}  {ms}")
    print(f"\nSN+BN overhead (D fwd train-eval): "
          + ", ".join(f"B{b}: {(rows['D_fwd_train(SN+BN)'][b] - rows['D_fwd_eval'][b]) * 1e3:.2f} ms"
                      for b in batches))


if __name__ == "__main__":
    main()
