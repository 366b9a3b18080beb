"""Exponential moving average of model parameters — done correctly.

The reference defines EMA(beta=0.995, step_start_ema=2000) but never
instantiates the EMA model, so `sample(use_ema=True)` crashes
(reference src/diff_modules.py:24-49,393,628 — SURVEY.md §2.2 M14).
Here EMA params are part of the train state and updated inside the jitted
train step: identity copy during warmup, lerp afterwards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    """EMA state starts as a (real, non-aliased) copy of the params."""
    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(ema_params, params, step, beta: float = 0.995, step_start: int = 2000):
    """Warmup (< step_start): track params exactly. After: ema = β·ema + (1-β)·p."""
    warm = step < step_start

    def _upd(e, p):
        return jnp.where(warm, p, beta * e + (1.0 - beta) * p)

    return jax.tree_util.tree_map(_upd, ema_params, params)
