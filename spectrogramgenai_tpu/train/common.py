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

#: valid values for the ``mode`` argument of :func:`state_shardings` /
#: :func:`shard_state` (and ``RunConfig.param_sharding``).
SHARD_MODES = ("replicate", "tp", "fsdp", "tp_fsdp")

# FSDP shards leaves with at least this many elements; below it the
# all-gather latency outweighs the memory saved (biases, norm scales,
# tiny kernels stay replicated).
FSDP_MIN_SIZE = 2**15


def tp_param_sharding(mesh: Mesh, leaf: jax.Array | jax.ShapeDtypeStruct,
                      min_dim: int = 256) -> NamedSharding:
    """Tensor-parallel rule: shard the output dim of large kernels over the
    model axis (GSPMD-style TP — XLA inserts the activation collectives).

    Dense kernels (in, out) and conv kernels (kh, kw, in, out) with an output
    dim ≥ min_dim divisible by the model-axis size are sharded on that dim;
    everything else (biases, norm scales, small kernels) replicates.
    """
    return param_sharding(mesh, leaf, mode="tp", min_dim=min_dim)


def param_sharding(mesh: Mesh, leaf: jax.Array | jax.ShapeDtypeStruct, mode: str = "tp",
                   min_dim: int = 256, fsdp_min_size: int = FSDP_MIN_SIZE) -> NamedSharding:
    """Composable parameter-sharding rule (GSPMD — XLA inserts all collectives).

    * ``tp``      — shard the output dim of large kernels over ``model``
                    (activation collectives over ICI).
    * ``fsdp``    — ZeRO-3 style: shard the largest remaining dim of every
                    large leaf over ``data``. Because the same rule is applied
                    to the whole TrainState tree, optimizer moments and the
                    EMA copy are sharded too — per-device state memory drops
                    ~|data| × for the large kernels. XLA all-gathers weights
                    per layer in the forward/backward and reduce-scatters the
                    gradient (the standard GSPMD FSDP recipe; the reference
                    has no distributed training at all, SURVEY.md §2.5).
    * ``tp_fsdp`` — both: model axis on the output dim, data axis on the
                    largest other divisible dim.
    * ``replicate`` — every leaf replicated.
    """
    if mode not in SHARD_MODES:
        raise ValueError(f"param sharding mode {mode!r} not in {SHARD_MODES}")
    shape = leaf.shape
    spec: list = [None] * len(shape)
    if len(shape) >= 2:
        tp = mesh.shape[MODEL_AXIS]
        if "tp" in mode and tp > 1 and shape[-1] >= min_dim and shape[-1] % tp == 0:
            spec[-1] = MODEL_AXIS
        dp = mesh.shape[DATA_AXIS]
        size = 1
        for d in shape:
            size *= d
        if "fsdp" in mode and dp > 1 and size >= fsdp_min_size:
            for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
                if spec[i] is None and shape[i] % dp == 0:
                    spec[i] = DATA_AXIS
                    break
    if all(axis is None for axis in spec):
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(*spec))


def state_shardings(mesh: Mesh, state, min_dim: int = 256, mode: str = "tp"):
    """Sharding tree for a TrainState: the param rule on every array leaf
    (optimizer moments and the EMA copy share parameter shapes so they
    inherit the same layout — under fsdp modes that is the ZeRO memory win)."""

    def rule(leaf):
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 2:
            return param_sharding(mesh, leaf, mode=mode, min_dim=min_dim)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, state)


def batch_shardings(mesh: Mesh, batch):
    def rule(leaf):
        ndim = getattr(leaf, "ndim", 1)
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    return jax.tree_util.tree_map(rule, batch)


def shard_state(mesh: Mesh, state, min_dim: int = 256, mode: str = "tp"):
    return jax.device_put(state, state_shardings(mesh, state, min_dim=min_dim, mode=mode))
