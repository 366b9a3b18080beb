"""In-context decomposition of the sampler UNet forward at chain geometry.

tools/sampler_microbench.py times each block as a STANDALONE jitted program,
which answers scaling questions but not absolute attribution: standalone
programs compile with different layouts/fusions than the same block inside
the full forward (measured: the standalone Up(128→64)@64² program runs
~65 ms while the ENTIRE in-context forward is ~20 ms).

This tool measures real in-context costs by identity-ablating modules inside
the actual jitted forward via flax's `nn.intercept_methods`:
SpatialSelfAttention blocks map (B,H,W,C)→(B,H,W,C), so returning the input
unchanged is shape-exact and the surrounding program is otherwise identical.
The difference (full − ablated) is the block's true marginal cost, including
whatever fusion opportunities its removal opens — stated as such.

Variants timed (all at the B=internal-batch CFG chain geometry):
  full          the production sampling forward (fused Pallas attention)
  no_sa5        sa_5 (4096 tokens, d=16 — the known hot site) ablated
  no_sa_any     all six SA blocks ablated → the pure conv/GN/upsample path
  ancestral     the elementwise CFG+ancestral update (for completeness)

Prints a table plus derived attribution: sa5 cost, other-SA cost, conv-path
cost, conv-path effective TF/s and MFU vs the XLA-counted forward FLOPs.

Run on the real TPU:  python tools/chain_ablation.py [--batch 54] [--iters 40]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=54,
                    help="internal batch (2× labels with CFG); 54 = production")
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from spectrogramgenai_tpu.core.config import DDPMConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.models.layers import SpatialSelfAttention
    from spectrogramgenai_tpu.models.vqvae import VQVAE
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask
    from spectrogramgenai_tpu.utils.benchtools import timeit_device

    cfg = DDPMConfig(img_size=256, latent=True, run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    vq = VQVAE(latent_dim=cfg.latent_dim, dtype=jnp.bfloat16)
    vq_vars = vq.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 256, 256, 1)))
    task = DiffusionTask(cfg, mesh, total_steps=100, vq_variables=vq_vars)
    state = task.init_state(0)

    b = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 64, 64, cfg.latent_dim)), jnp.float32)
    t = jnp.full((b,), 500.0)
    y = jnp.arange(b, dtype=jnp.int32) % cfg.num_classes
    mask = jnp.ones((b,))

    def ablated_fwd(names):
        """Jitted sampling forward with the named SA modules ablated to
        identity (names=None → ablate every SpatialSelfAttention)."""

        def interceptor(next_fn, iargs, ikwargs, context):
            mod = context.module
            if isinstance(mod, SpatialSelfAttention) and context.method_name == "__call__":
                if names is None or mod.name in names:
                    return iargs[0]
            return next_fn(*iargs, **ikwargs)

        def fwd(params, x, t, y, mask):
            # the context is active during jit TRACING (this fn body), which
            # is when flax method calls happen — the compiled program keeps
            # the ablation permanently
            with nn.intercept_methods(interceptor):
                return task._apply_sample(params, x, t, y, mask)

        return jax.jit(fwd)

    variants = [
        ("full", jax.jit(task._apply_sample)),
        ("no_sa5", ablated_fwd({"sa_5"})),
        ("no_sa_any", ablated_fwd(None)),
    ]

    times = {}
    for name, fn in variants:
        times[name] = timeit_device(fn, state.params, x, t, y, mask, iters=args.iters)
        print(f"{name:12s} {times[name] * 1e3:7.2f} ms", flush=True)

    # sanity: ablation must actually change the function (different outputs)
    full_out = np.asarray(variants[0][1](state.params, x, t, y, mask)[:1, :2, :2, 0])
    abl_out = np.asarray(variants[2][1](state.params, x, t, y, mask)[:1, :2, :2, 0])
    assert not np.allclose(full_out, abl_out), "ablation was a no-op?"

    # elementwise ancestral update tail, for completeness
    import functools

    @jax.jit
    def anc(xc, ec, eu, nz):
        e = eu + 3.0 * (ec - eu)
        return (1.0 / jnp.sqrt(0.99)) * (xc - (0.01 / jnp.sqrt(0.3)) * e) + 0.1 * nz

    n = b // 2
    sh = (n, 64, 64, cfg.latent_dim)
    anc_args = [jnp.asarray(rng.standard_normal(sh), jnp.float32) for _ in range(4)]
    times["ancestral"] = timeit_device(anc, *anc_args, iters=args.iters)

    # XLA-counted FLOPs of the full forward (excludes Pallas custom calls)
    flops = None
    try:
        a = variants[0][1].lower(state.params, x, t, y, mask).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        flops = float(a["flops"])
    except Exception:
        pass

    sa5 = times["full"] - times["no_sa5"]
    sa_all = times["full"] - times["no_sa_any"]
    conv = times["no_sa_any"]
    print(f"\nin-context attribution at internal batch {b} (marginal, incl. "
          "fusion changes):")
    print(f"  sa5 (4096 tok, d=16)   {sa5 * 1e3:7.2f} ms  "
          f"({100 * sa5 / times['full']:.0f}% of fwd)")
    print(f"  other 5 SA blocks      {(sa_all - sa5) * 1e3:7.2f} ms  "
          f"({100 * (sa_all - sa5) / times['full']:.0f}%)")
    print(f"  conv/GN/upsample path  {conv * 1e3:7.2f} ms  "
          f"({100 * conv / times['full']:.0f}%)")
    print(f"  ancestral update tail  {times['ancestral'] * 1e3:7.2f} ms")
    if flops is not None:
        # the conv path's share of the XLA-counted FLOPs ≈ all of them
        # (einsum SA at 256/64 tokens is negligible; Pallas calls aren't
        # counted), so conv-path effective rate ≈ flops/conv
        eff = flops / conv
        print(f"  XLA fwd GFLOPs {flops / 1e9:.1f} → conv-path "
              f"{eff / 1e12:.1f} TF/s = {100 * eff / 197e12:.0f}% of v5e bf16 peak")


if __name__ == "__main__":
    main()
