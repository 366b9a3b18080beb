"""Optimizers (torch-equivalent hyperparameters) and mesh sharding rules."""

from __future__ import annotations

import inspect

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectrogramgenai_tpu.core.mesh import DATA_AXIS, MODEL_AXIS


def make_adamw_onecycle(max_lr: float, total_steps: int, eps: float = 1e-5,
                        weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW + OneCycle cosine LR — the reference DDPM recipe
    (diff_modules.py:551-557; torch OneCycleLR defaults: pct_start 0.3,
    div_factor 25, final_div_factor 1e4, cosine annealing)."""
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1),
        peak_value=max_lr,
        pct_start=0.3,
        div_factor=25.0,
        final_div_factor=1e4,
    )
    return optax.adamw(schedule, b1=0.9, b2=0.999, eps=eps, weight_decay=weight_decay)


def make_rmsprop(lr: float, alpha: float = 0.99, eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.RMSprop equivalent (train_acgan.py:185-190):
    ν = α·ν + (1-α)·g²; update = g / (√ν + eps) — eps OUTSIDE the sqrt."""
    kwargs = {}
    if "eps_in_sqrt" in inspect.signature(optax.rmsprop).parameters:
        kwargs["eps_in_sqrt"] = False
    return optax.rmsprop(lr, decay=alpha, eps=eps, **kwargs)


def make_adam(lr: float) -> optax.GradientTransformation:
    return optax.adam(lr)


# ---------------------------------------------------------------------------
# Sharding rules
# ---------------------------------------------------------------------------


def tp_param_sharding(mesh: Mesh, leaf: jax.Array | jax.ShapeDtypeStruct,
                      min_dim: int = 256) -> NamedSharding:
    """Tensor-parallel rule: shard the output dim of large kernels over the
    model axis (GSPMD-style TP — XLA inserts the activation collectives).

    Dense kernels (in, out) and conv kernels (kh, kw, in, out) with an output
    dim ≥ min_dim divisible by the model-axis size are sharded on that dim;
    everything else (biases, norm scales, small kernels) replicates.
    """
    tp = mesh.shape[MODEL_AXIS]
    shape = leaf.shape
    if tp > 1 and len(shape) >= 2 and shape[-1] >= min_dim and shape[-1] % tp == 0:
        return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), MODEL_AXIS))
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, state, min_dim: int = 256):
    """Sharding tree for a TrainState: TP rule on every array leaf (optimizer
    moments share parameter shapes so they inherit the same layout)."""

    def rule(leaf):
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 2:
            return tp_param_sharding(mesh, leaf, min_dim=min_dim)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, state)


def batch_shardings(mesh: Mesh, batch):
    def rule(leaf):
        ndim = getattr(leaf, "ndim", 1)
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    return jax.tree_util.tree_map(rule, batch)


def shard_state(mesh: Mesh, state, min_dim: int = 256):
    return jax.device_put(state, state_shardings(mesh, state, min_dim=min_dim))
