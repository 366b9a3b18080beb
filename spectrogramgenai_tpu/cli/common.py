"""Shared CLI bootstrap: compilation cache, NaN-debug mode, seeding."""

from __future__ import annotations

import logging
import os


def enable_compile_cache():
    """Persistent XLA compile cache — the remote TPU compile path is slow,
    so every CLI (config-driven or not) should turn this on."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("SPECAI_COMPILE_CACHE", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def setup(run_cfg, debug_nans: bool = False):
    """Apply runtime config every trainer CLI wants.

    - INFO-level logging (library modules report through logging, e.g. the
      pretrained-weight load confirmation — without this the root logger's
      WARNING default would swallow them; format mirrors the reference's
      basicConfig, train_ddpm.py:40-44),
    - persistent compilation cache (the remote TPU compile service is slow;
      caching across runs matters),
    - optional jax NaN checking (SURVEY.md §5 "race detection / sanitizers"
      rebuild: jit-purity discipline + NaN-check mode flag),
    - host+JAX seeding.
    """
    import jax

    logging.basicConfig(
        format="%(asctime)s - %(levelname)s: %(message)s",
        level=logging.INFO,
        datefmt="%I:%M:%S",
    )

    enable_compile_cache()
    if debug_nans:
        jax.config.update("jax_debug_nans", True)

    from spectrogramgenai_tpu.core.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    from spectrogramgenai_tpu.utils.misc import set_seed

    return set_seed(run_cfg.seed)
