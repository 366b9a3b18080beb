"""Microbenchmark the fused attention kernel at the UNet's hot shapes.

The latent-diffusion UNet's most expensive attention is SA(64) at 64x64
(4096 tokens, 4 heads, head_dim 16 — reference diff_modules.py:160-166);
head_dim=16 under-fills the MXU's 128-deep contraction on QK^T and
lane-pads the PV output 8x, so this is where kernel-layout experiments pay.

Run on the real TPU: python tools/attn_microbench.py [--train]
Prints per-variant ms and achieved TFLOP/s.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


import sys

sys.path.insert(0, ".")
from spectrogramgenai_tpu.utils.benchtools import timeit_device  # noqa: E402


def timeit(fn, *args, iters=50):
    return timeit_device(fn, *args, iters=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true", help="also time fwd+bwd")
    ap.add_argument("--batch", type=int, default=54)
    args = ap.parse_args()

    from spectrogramgenai_tpu.ops.attention import fused_attention

    shapes = [
        # (B, H, N, D) — the three attention sites of the latent UNet fwd
        (args.batch, 4, 4096, 16),   # SA(64) @ 64x64  (x2 call sites)
        (args.batch, 4, 1024, 32),   # SA(128) @ 32x32 (x2)
        (args.batch, 4, 256, 64),    # SA(256) @ 16x16 (x2)
    ]
    rng = np.random.default_rng(0)
    for (b, h, n, d) in shapes:
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        flops = 4 * b * h * n * n * d  # 2 matmuls, 2 flops/MAC

        for qb in (128, 256, 512, 1024):
            if n % qb:
                continue
            f = jax.jit(functools.partial(fused_attention, q_block=qb))
            try:
                dt = timeit(f, q, k, v)
            except Exception as e:  # e.g. VMEM OOM at big q_blocks — keep sweeping
                print(f"fwd  B{b} H{h} N{n} d{d} qb{qb}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})")
                continue
            print(f"fwd  B{b} H{h} N{n} d{d} qb{qb}: {dt*1e3:8.2f} ms  "
                  f"{flops/dt/1e12:6.2f} TF/s")

        # einsum reference path (what SpatialSelfAttention uses when not
        # fused) — decides where the fused gate should sit
        def einsum_attn(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)

        if b * h * n * n * 4 < 2 << 30:  # skip where the f32 scores can't fit HBM
            try:
                dt = timeit(jax.jit(einsum_attn), q, k, v)
                print(f"eins B{b} H{h} N{n} d{d}:          {dt*1e3:8.2f} ms  "
                      f"{flops/dt/1e12:6.2f} TF/s")
            except Exception as e:
                print(f"eins B{b} H{h} N{n} d{d}: FAILED ({type(e).__name__})")

        if args.train:
            def loss(q, k, v):
                return jnp.sum(fused_attention(q, k, v).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            dt = timeit(g, q, k, v)
            print(f"grad B{b} H{h} N{n} d{d}:          {dt*1e3:8.2f} ms  "
                  f"{3.5*flops/dt/1e12:6.2f} TF/s (est)")


if __name__ == "__main__":
    main()
