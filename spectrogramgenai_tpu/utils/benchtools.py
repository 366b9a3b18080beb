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


def timeit_device(fn, *args, iters: int = 10, warmup: int = 2):
    """Median wall-clock seconds per call of fn(*args), properly synced."""
    for _ in range(warmup):
        device_sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        device_sync(r)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
