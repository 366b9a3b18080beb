"""Optimizers (torch-equivalent hyperparameters), mesh sharding rules, and
the shared gradient-accumulation scan used by every task."""

from __future__ import annotations

import inspect

import jax
import jax.numpy as jnp
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
# Gradient accumulation (shared by all tasks — reference helpers.py:740-798's
# per-batch update, scaled past per-chip HBM by splitting each global batch
# into k sequential microbatches inside ONE jitted step)
# ---------------------------------------------------------------------------


def microbatch_split(tree, k: int, mesh: Mesh | None = None):
    """Reshape every (n, …) array leaf of ``tree`` to (k, n/k, …) for a
    lax.scan over microbatches.

    With a multi-device mesh the microbatch dim keeps its data-axis sharding
    (the leading k axis is scan *time*, never materialized per device), so
    each scanned microbatch runs the same SPMD program as a plain step.
    Raises the same "not divisible by grad_accum" ValueError every task's
    CLI surfaces.
    """

    def _split(a):
        n = a.shape[0]
        if n % k:
            raise ValueError(f"batch {n} not divisible by grad_accum={k}")
        return a.reshape(k, n // k, *a.shape[1:])

    out = jax.tree_util.tree_map(_split, tree)
    if mesh is not None and mesh.shape[DATA_AXIS] > 1:
        def _constrain(a):
            spec = P(None, DATA_AXIS, *([None] * (a.ndim - 2)))
            return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

        out = jax.tree_util.tree_map(_constrain, out)
    return out


def microbatch_accumulate(body, carry, xs, k: int):
    """``lax.scan`` the microbatch ``body(carry, x) → (carry, outs)`` over the
    k-leading arrays in ``xs``, SUMMING the ``outs`` pytrees in the scan carry
    — only one microbatch's activations are ever live, which is the whole
    point — and return ``(final_carry, mean_outs)``.

    ``carry`` threads sequential state (BatchNorm stats, the VQ-EMA codebook)
    microbatch-to-microbatch, exactly as if the loader had delivered k
    successive batches; grads/metrics in ``outs`` are averaged, so the caller
    applies ONE optimizer update — one LR-schedule tick — for the whole
    effective batch.
    """
    first = jax.tree_util.tree_map(lambda a: a[0], xs)
    out_shapes = jax.eval_shape(lambda c, x: body(c, x), carry, first)[1]
    zeros = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), out_shapes)

    def scan_body(c, x):
        inner, acc = c
        inner, outs = body(inner, x)
        return (inner, jax.tree_util.tree_map(jnp.add, acc, outs)), None

    (carry, acc), _ = jax.lax.scan(scan_body, (carry, zeros), xs)
    return carry, jax.tree_util.tree_map(lambda a: a / k, acc)


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
