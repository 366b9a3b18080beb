"""Parallelism layer: device mesh, shardings, collectives-by-construction.

The canonical API surface for scaling (SURVEY.md §2.5 rebuild table):

  * :func:`create_mesh` / :class:`MeshSpec` — (data × model) device grid;
    identical code on 1 chip, a v5e-8 slice, or N virtual CPU devices.
  * :func:`batch_sharding` / :func:`shard_batch` — DP batch placement; XLA
    inserts the gradient psums over ICI.
  * :func:`param_sharding` / :func:`state_shardings` / :func:`shard_state`
    — GSPMD parameter sharding: ``tp`` (wide kernels over the ``model``
    axis), ``fsdp`` (ZeRO-3 style params/optimizer/EMA over the ``data``
    axis), or ``tp_fsdp`` combined (``SHARD_MODES``).
  * :func:`maybe_initialize_distributed` — multi-host (DCN) bring-up.
  * :func:`padded_eval_batches` / :func:`device_prefetch` — host-side input
    sharding and device prefetch.

Implementations live in core/mesh.py, train/common.py and data/pipeline.py;
this package is the stable import point:

    from spectrogramgenai_tpu.parallel import create_mesh, shard_batch
"""

from spectrogramgenai_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshSpec,
    batch_sharding,
    create_mesh,
    local_batch_size,
    maybe_initialize_distributed,
    replicated,
    shard_batch,
)
from spectrogramgenai_tpu.data.pipeline import device_prefetch, padded_eval_batches
from spectrogramgenai_tpu.train.common import (
    SHARD_MODES,
    batch_shardings,
    param_sharding,
    shard_state,
    state_shardings,
    tp_param_sharding,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "MeshSpec",
    "batch_sharding",
    "create_mesh",
    "local_batch_size",
    "maybe_initialize_distributed",
    "replicated",
    "shard_batch",
    "device_prefetch",
    "padded_eval_batches",
    "SHARD_MODES",
    "batch_shardings",
    "param_sharding",
    "shard_state",
    "state_shardings",
    "tp_param_sharding",
]
