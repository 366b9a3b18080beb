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
    """Force completion of `x` via ONE element-sized host fetch.

    Tunnel artifacts this avoids (each measured to swamp timings):
      * a per-leaf fetch costs ~20-30 ms RTT EACH — a 4-leaf metrics dict
        cost ~120 ms per sync, a TrainState hundreds of RTTs (pre-r3 bug);
      * np.asarray(full leaf) downloads the whole tensor (~MB/s tunnel).
    All outputs of one executable become ready together, so fetching one
    device-sliced element of the first array leaf is a complete sync for
    the (universal here) case that `x` came out of a single jitted call.
    """
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype"):
            return float(np.asarray(jnp.ravel(leaf)[:1].astype(jnp.float32))[0])
    return 0.0


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
