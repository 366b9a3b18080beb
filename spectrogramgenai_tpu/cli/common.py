"""Shared CLI bootstrap: compilation cache, NaN-debug mode, seeding."""

from __future__ import annotations

import os


def setup(run_cfg, debug_nans: bool = False):
    """Apply runtime config every trainer CLI wants.

    - persistent compilation cache (the remote TPU compile service is slow;
      caching across runs matters),
    - optional jax NaN checking (SURVEY.md §5 "race detection / sanitizers"
      rebuild: jit-purity discipline + NaN-check mode flag),
    - host+JAX seeding.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("SPECAI_COMPILE_CACHE", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    if debug_nans:
        jax.config.update("jax_debug_nans", True)

    from spectrogramgenai_tpu.core.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    from spectrogramgenai_tpu.utils.misc import set_seed

    return set_seed(run_cfg.seed)
