"""Benchmark timing utilities.

On tunneled/remote TPU backends ``block_until_ready`` can be a no-op, so all
timing here synchronizes via an actual device→host transfer of a scalar
reduction of the result (which cannot complete before the computation does).
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np


def device_sync(x) -> float:
    """Force completion of `x` (pytree ok) via a scalar host fetch."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    total = 0.0
    for leaf in leaves:
        if hasattr(leaf, "dtype"):
            total += float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))
    return total


def timeit_device(fn, *args, iters: int = 30, warmup: int = 2):
    """Mean wall-clock seconds per call of fn(*args), properly synced.

    Calls are PIPELINED with a single end-of-loop sync: through the axon
    tunnel one device→host sync costs ~20-30 ms RTT while pipelined dispatch
    is ~1 ms, so a per-iteration sync (the pre-r3 behavior) adds a ~30/1
    artifact floor to every reported step — it undersold the fused mel
    kernel ~2× (measured 43 vs ~21 ms/batch). The one remaining sync
    amortizes to ~30/iters ms; keep iters ≥ 20 (CLAUDE.md timing rule).
    """
    for _ in range(warmup):
        device_sync(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    device_sync(r)
    return (time.perf_counter() - t0) / iters
