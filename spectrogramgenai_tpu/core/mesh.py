"""Device mesh / sharding layer.

The reference is single-device PyTorch (SURVEY.md §2.5: no distributed code at
all). Here parallelism is a first-class axis of the framework: every trainer
runs SPMD over a ``jax.sharding.Mesh`` with a ``data`` axis (batch/DP) and a
``model`` axis (tensor parallelism for the wide layers). The same code runs on
1 CPU device, 8 virtual CPU devices (tests), one v5e chip, or a v5e-8 slice —
XLA inserts the gradient psums / activation collectives over ICI.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """How to carve the device grid. ``data=-1`` means "all remaining"."""

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model > n_devices:
            raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n_devices}")
        return data, model


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up over DCN (SURVEY.md §2.5 rebuild table).

    When the standard cluster env vars are present (JAX_COORDINATOR_ADDRESS /
    JAX standard envs), call jax.distributed.initialize so jax.devices() spans
    all hosts; single-host runs are untouched. Returns True if initialized.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        import jax

        if jax.process_count() == 1:  # not yet initialized
            jax.distributed.initialize()
        return True
    return False


def create_mesh(spec: MeshSpec = MeshSpec(), devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    On a multi-chip slice the mesh axes ride ICI; on one device this is a
    trivial 1x1 mesh and all shardings become no-ops — trainers never branch
    on device count.
    """
    devices = jax.devices() if devices is None else devices
    data, model = spec.resolve(len(devices))
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a pytree of host arrays with batch-dim sharding."""

    def _put(x):
        return jax.device_put(x, batch_sharding(mesh, ndim=max(1, x.ndim)))

    return jax.tree_util.tree_map(_put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    data = mesh.shape[DATA_AXIS]
    if global_batch % data != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {data}")
    return global_batch // data
