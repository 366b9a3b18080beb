"""Worker process for tests/test_multiprocess.py (not a pytest file).

Runs ONE data-parallel DDPM train step over an 8-device CPU mesh — either as
a single process owning all 8 virtual devices, or as one of
JAX_NUM_PROCESSES processes each owning 8/N of them, brought up for real via
``core.mesh.maybe_initialize_distributed`` (localhost coordinator, gloo
cross-process collectives). The data path is the production one:
``iterate_batches`` (auto per-process input sharding) → ``device_prefetch``
→ ``core.mesh.shard_batch`` (jax.make_array_from_process_local_data when
process_count > 1).

Prints one JSON line: train loss, an eval-padding checksum, and sharding
diagnostics. The parent test asserts the multi-process numbers match the
single-process 8-device run — the reference has no distributed code at all
(SURVEY.md §2.5); this is the DCN/multi-host leg of the rebuild's mesh layer,
actually executed.
"""

from __future__ import annotations

import json

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from spectrogramgenai_tpu.core.mesh import maybe_initialize_distributed  # noqa: E402

maybe_initialize_distributed()

import numpy as np  # noqa: E402

GLOBAL_BATCH = 8
IMG = 32
EVAL_N = 10  # deliberately NOT divisible by 8: exercises remainder padding


class SyntheticSource:
    """Deterministic tiny dataset — identical on every process (same seed),
    exactly the multi-host contract iterate_batches documents."""

    def __init__(self, n: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.images = rng.uniform(0, 1, (n, IMG, IMG, 1)).astype(np.float32)
        self.labels = rng.integers(0, 27, (n,)).astype(np.int32)

    def epoch_indices(self) -> np.ndarray:
        return np.arange(len(self.labels))

    def load(self, i: int) -> dict:
        return {"image": self.images[i], "label": self.labels[i]}


def main() -> None:
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.config import DDPMConfig, RunConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.data.pipeline import (
        device_prefetch,
        iterate_batches,
        padded_eval_batches,
    )
    from spectrogramgenai_tpu.models.vqvae import VQVAE
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask

    assert len(jax.devices()) == 8, f"expected 8 global devices, got {len(jax.devices())}"
    mesh = create_mesh(MeshSpec(data=8, model=1))

    cfg = DDPMConfig(
        img_size=IMG,
        latent=True,
        noise_steps=100,
        num_classes=27,
        width_mult=0.25,
        remove_deep_conv=True,
        vq_hidden_dim=32,
        vq_n_embeddings=32,
        compute_dtype="float32",
        run=RunConfig(seed=0),
    )
    vq = VQVAE(hidden_dim=cfg.vq_hidden_dim, latent_dim=cfg.latent_dim,
               n_embeddings=cfg.vq_n_embeddings)
    vq_vars = vq.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, IMG, IMG, 1)))
    task = DiffusionTask(cfg, mesh, total_steps=10, vq_variables=vq_vars)
    state = task.init_state(0)
    step = task.make_train_step()

    src = SyntheticSource(GLOBAL_BATCH)
    it = device_prefetch(iterate_batches(src, GLOBAL_BATCH, epochs=1), mesh)
    batch = next(it)

    # each process must hold exactly its GLOBAL/process_count rows
    local_rows = sum(s.data.shape[0] for s in batch["image"].addressable_shards)
    assert local_rows == GLOBAL_BATCH // jax.process_count(), local_rows
    assert batch["image"].shape[0] == GLOBAL_BATCH  # global view intact

    state, metrics = step(state, batch["image"], batch["label"])
    loss = float(metrics["train_mse"])

    # eval-remainder path: 10 samples, batch 8 → one full batch + one padded;
    # checksum = Σ image values over true rows (pads are zeros), n stays global
    eval_src = SyntheticSource(EVAL_N, seed=3)
    sum_fn = jax.jit(lambda x: x.sum())
    checksum, n_seen = 0.0, 0
    for eb, n_true in padded_eval_batches(eval_src, GLOBAL_BATCH, mesh):
        checksum += float(sum_fn(eb["image"]))
        n_seen += n_true

    print(json.dumps({
        "process": jax.process_index(),
        "process_count": jax.process_count(),
        "devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "loss": loss,
        "eval_checksum": checksum,
        "eval_n": n_seen,
    }), flush=True)


if __name__ == "__main__":
    main()
