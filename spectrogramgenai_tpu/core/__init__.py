from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh, batch_sharding, replicated, shard_batch
from spectrogramgenai_tpu.core.metrics import MetricsLogger
from spectrogramgenai_tpu.core.ema import ema_init, ema_update
from spectrogramgenai_tpu.core.checkpoint import CheckpointManager

__all__ = [
    "MeshSpec",
    "create_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "MetricsLogger",
    "ema_init",
    "ema_update",
    "CheckpointManager",
]
