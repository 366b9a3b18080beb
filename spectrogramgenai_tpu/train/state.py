"""Train state pytree: params + optimizer + EMA + mutable stats + RNG + step.

Everything a resumable run needs lives in one pytree (SURVEY.md §5
checkpoint/resume rebuild note): restoring it continues the run
deterministically, including the PRNG stream.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    ema_params: Any = None
    stats: Any = None  # mutable collections: batch_stats / codebook / …


def new_train_state(params, tx, rng, ema_params=None, stats=None) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
        ema_params=ema_params,
        stats=stats if stats is not None else {},
    )
