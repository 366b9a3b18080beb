"""In-context decomposition of the DDPM TRAIN step at production geometry.

Counterpart of tools/chain_ablation.py (which closed the sampler-forward
ceiling question): the train step runs fwd + bwd + AdamW/OneCycle + EMA in
one jitted program, and its measured MFU (36% at batch 32, bench.py
ddpm_train) has no attribution on record. Standalone timings of blocks are
biased (different layouts/fusions than in-context — see chain_ablation's
docstring), so this ablates modules INSIDE the real jitted step:

  full        the production train step (fused Pallas attention fwd+bwd,
              frozen VQ encode, AdamW+EMA update), grad_accum=1
  no_sa5      sa_5 (4096-token, d=16) identity-ablated — removes its fwd
              AND bwd cost (identity's VJP is pass-through, exact)
  no_sa_any   all six SA blocks ablated → conv/GN/resize path fwd+bwd
  no_vq       frozen VQ encode replaced by a shape-exact strided gather
              (the encode is fwd-only: loss grads are wrt UNet params)
  grads_only  loss + grads but NO optimizer/EMA update → update-tail cost

Marginals are reported as (full − variant), i.e. the block's true
in-context cost including whatever fusion its removal opens, stated as such.

Run on the real TPU:  python tools/train_ablation.py [--batch 32] [--iters 30]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32,
                    help="per-chip train batch; 32 = measured HBM capacity")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from spectrogramgenai_tpu.core.config import DDPMConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.diffusion.ddpm import diffusion_loss
    from spectrogramgenai_tpu.models.layers import SpatialSelfAttention
    from spectrogramgenai_tpu.models.vqvae import VQVAE
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask
    from spectrogramgenai_tpu.utils.benchtools import timeit_device

    cfg = DDPMConfig(img_size=256, latent=True, run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    vq = VQVAE(latent_dim=cfg.latent_dim, dtype=jnp.bfloat16)
    vq_vars = vq.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 256, 256, 1)))
    task = DiffusionTask(cfg, mesh, total_steps=1000, vq_variables=vq_vars)
    state = task.init_state(0)

    b = args.batch
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (b, 256, 256, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, (b,)), jnp.int32)

    def interceptor_for(names, ablate_vq):
        def interceptor(next_fn, iargs, ikwargs, context):
            mod = context.module
            if isinstance(mod, SpatialSelfAttention) and context.method_name == "__call__":
                if names is not None and (names == "all" or mod.name in names):
                    return iargs[0]
            if ablate_vq and isinstance(mod, VQVAE) and context.method_name == "encode":
                x = iargs[0]
                d = cfg.latent_downscale
                # shape-exact, near-free stand-in for the encoder
                return jnp.repeat(x[:, ::d, ::d, :], cfg.latent_dim, axis=-1)
            return next_fn(*iargs, **ikwargs)

        return interceptor

    def step_variant(names=None, ablate_vq=False, update=True):
        """Jitted train step with the named ablations (trace-time interception
        bakes them into the compiled program permanently)."""
        interceptor = interceptor_for(names, ablate_vq)

        def loss_fn(params, imgs, labs, key):
            x = task._encode(imgs)
            return diffusion_loss(task._apply, params, task.schedule, x, labs,
                                  key, task.cfg.label_drop)

        def step(state, imgs, labs):
            with nn.intercept_methods(interceptor):
                if update:
                    return task._train_step(state, imgs, labs)
                # grads computed and reduced (cannot be dead-code-eliminated),
                # but no AdamW/OneCycle/EMA tail
                _, step_key = jax.random.split(state.rng)
                loss, grads = jax.value_and_grad(loss_fn)(state.params, imgs, labs, step_key)
                tot = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
                return loss, tot

        return jax.jit(step)

    variants = [
        ("full", step_variant()),
        ("no_sa5", step_variant(names={"sa_5"})),
        ("no_sa_any", step_variant(names="all")),
        ("no_vq", step_variant(ablate_vq=True)),
        ("grads_only", step_variant(update=False)),
    ]

    times = {}
    for name, fn in variants:
        times[name] = timeit_device(fn, state, images, labels, iters=args.iters)
        print(f"{name:12s} {times[name] * 1e3:7.2f} ms "
              f"({b / times[name]:.0f} img/s)", flush=True)

    # sanity: ablations actually change the computed loss
    full_loss = float(variants[0][1](state, images, labels)[1]["train_mse"])
    nosa_loss = float(variants[2][1](state, images, labels)[1]["train_mse"])
    novq_loss = float(variants[3][1](state, images, labels)[1]["train_mse"])
    assert abs(full_loss - nosa_loss) > 1e-7, "SA ablation was a no-op?"
    assert abs(full_loss - novq_loss) > 1e-7, "VQ ablation was a no-op?"

    sa5 = times["full"] - times["no_sa5"]
    sa_all = times["full"] - times["no_sa_any"]
    vq = times["full"] - times["no_vq"]
    upd = times["full"] - times["grads_only"]
    conv = times["full"] - sa_all - vq - upd
    tf = times["full"]
    print(f"\nin-context train-step attribution at batch {b} (marginal, "
          "incl. fusion changes):")
    print(f"  sa5 fwd+bwd (4096 tok, d=16)  {sa5 * 1e3:7.2f} ms  ({100 * sa5 / tf:.0f}%)")
    print(f"  other 5 SA blocks fwd+bwd     {(sa_all - sa5) * 1e3:7.2f} ms  "
          f"({100 * (sa_all - sa5) / tf:.0f}%)")
    print(f"  frozen VQ encode (fwd-only)   {vq * 1e3:7.2f} ms  ({100 * vq / tf:.0f}%)")
    print(f"  AdamW+OneCycle+EMA tail       {upd * 1e3:7.2f} ms  ({100 * upd / tf:.0f}%)")
    print(f"  conv/GN/resize fwd+bwd rest   {conv * 1e3:7.2f} ms  ({100 * conv / tf:.0f}%)")

    # XLA-counted FLOPs of the full step (excludes Pallas custom calls) →
    # effective rate of the non-attention remainder
    try:
        a = variants[0][1].lower(state, images, labels).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        flops = float(a["flops"])
        eff = flops / (conv + vq)
        print(f"  XLA step GFLOPs {flops / 1e9:.1f} → non-attention path "
              f"{eff / 1e12:.2f} TF/s = {100 * eff / 197e12:.0f}% of v5e bf16 peak")
    except Exception as e:
        print(f"  (cost_analysis unavailable: {e})")


if __name__ == "__main__":
    main()
