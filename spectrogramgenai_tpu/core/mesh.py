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

    When coordinator env vars are present, call jax.distributed.initialize so
    jax.devices() spans all hosts; single-host runs are untouched. Explicit
    envs (the portable path, no cluster auto-detection needed):

        JAX_COORDINATOR_ADDRESS=host:port  JAX_NUM_PROCESSES=N  JAX_PROCESS_ID=i

    With only the address set, jax's own cluster detection fills in the rest
    (TPU pod / Slurm environments). Returns True if initialized. Executed for
    real by tests/test_multiprocess.py (2 processes × 4 virtual CPU devices,
    gloo cross-process collectives).
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return False
    import jax

    # NOT jax.process_count(): that initializes the XLA backend, after which
    # jax.distributed.initialize() refuses to run.
    if not jax.distributed.is_initialized():
        kwargs = {"coordinator_address": addr}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
    return True


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


def process_local_slice(n: int) -> slice:
    """The contiguous rows of an n-row GLOBAL batch owned by this process.

    jax.devices() orders devices by process and create_mesh reshapes that
    order row-major, so each process's addressable data-axis rows form one
    contiguous block: process i of P owns rows [i·n/P, (i+1)·n/P).
    """
    pc, pi = jax.process_count(), jax.process_index()
    if n % pc:
        raise ValueError(f"global batch {n} not divisible by process count {pc}")
    per = n // pc
    return slice(pi * per, (pi + 1) * per)


def shard_batch(mesh: Mesh, batch):
    """Put a pytree of host arrays onto the mesh with batch-dim sharding.

    Single-process: plain ``jax.device_put`` with a NamedSharding. Multi-host
    (DCN, ``jax.process_count() > 1``): each process passes only its LOCAL
    rows — global_batch/process_count of them, which the input pipeline
    yields natively (``iterate_batches(process_shard=True)``) — and the
    global array is assembled with jax.make_array_from_process_local_data
    (device_put of a full host array cannot address other hosts' devices).
    Executed for real by tests/test_multiprocess.py.
    """
    multiproc = jax.process_count() > 1

    def _put(x):
        sharding = batch_sharding(mesh, ndim=max(1, getattr(x, "ndim", 1)))
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    data = mesh.shape[DATA_AXIS]
    if global_batch % data != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {data}")
    return global_batch // data
