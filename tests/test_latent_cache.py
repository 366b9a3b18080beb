"""Latent caching (data/latent_cache.py + encoded train step): the cached
path must be value-identical to on-the-fly encoding — same latents, same
loss, same parameter update, same shuffle stream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrogramgenai_tpu.core.config import DDPMConfig, DataConfig, RunConfig
from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh, shard_batch
from spectrogramgenai_tpu.data.latent_cache import LatentCacheSource
from spectrogramgenai_tpu.data.pipeline import ImageFolderSource, device_prefetch, iterate_batches
from spectrogramgenai_tpu.models.vqvae import VQVAE
from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask

IMG = 32
CLASSES = ["ant", "bee"]


def latent_task(mesh, num_classes=2):
    cfg = DDPMConfig(img_size=IMG, latent=True, noise_steps=16, num_classes=num_classes,
                     width_mult=0.25, remove_deep_conv=True, vq_hidden_dim=16,
                     vq_n_embeddings=16, compute_dtype="float32",
                     run=RunConfig(seed=0), data=DataConfig(batch_size=8, img_size=IMG))
    vq = VQVAE(hidden_dim=cfg.vq_hidden_dim, latent_dim=cfg.latent_dim,
               n_embeddings=cfg.vq_n_embeddings, dtype=jnp.float32)
    vq_vars = vq.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, IMG, IMG, 1)))
    return DiffusionTask(cfg, mesh, total_steps=10, vq_variables=vq_vars, vqvae=vq)


@pytest.fixture()
def image_folder(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in CLASSES:
        d = tmp_path / "train" / c
        d.mkdir(parents=True)
        for i in range(5):  # 10 total: exercises the encode-pad tail chunk
            arr = rng.integers(0, 256, (IMG, IMG), np.uint8)
            Image.fromarray(arr, mode="L").save(d / f"{c}_{i}.png")
    return str(tmp_path / "train")


def test_encoded_step_matches_image_step():
    mesh = create_mesh(MeshSpec(data=8))
    task = latent_task(mesh)
    rng = np.random.default_rng(3)
    images = rng.uniform(0, 1, (8, IMG, IMG, 1)).astype(np.float32)
    labels = rng.integers(0, 2, (8,)).astype(np.int32)
    batch = shard_batch(mesh, {"image": images, "label": labels})
    latents = task.make_encoder()(batch["image"])

    s_img, m_img = task.make_train_step()(task.init_state(0), batch["image"], batch["label"])
    s_lat, m_lat = task.make_train_step(encoded=True)(task.init_state(0), latents, batch["label"])

    np.testing.assert_allclose(float(m_img["train_mse"]), float(m_lat["train_mse"]),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s_img.params),
                    jax.tree_util.tree_leaves(s_lat.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    # the rng stream advanced identically → next step stays in lockstep
    np.testing.assert_array_equal(np.asarray(s_img.rng), np.asarray(s_lat.rng))


def test_latent_cache_source(image_folder):
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = latent_task(mesh)
    encoder = task.make_encoder()

    src = ImageFolderSource(image_folder, img_size=IMG, seed=7)
    cached = LatentCacheSource(src, encoder, encode_batch=4)  # 10 = 4+4+2(pad)

    s = task.cfg.img_size // task.cfg.latent_downscale
    assert cached.latents.shape == (10, s, s, task.cfg.latent_dim)
    np.testing.assert_array_equal(cached.labels, src.labels)

    # cached latents == direct encode of the same decoded images
    chunk = np.asarray([9, 0, 5])
    direct = np.asarray(encoder(src.load_batch(chunk)["image"]))
    got = cached.load_batch(chunk)
    np.testing.assert_allclose(got["latent"], direct, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(got["label"], src.labels[chunk])

    # epoch_indices delegates: identical shuffle stream to an uncached source
    # built with the same seed (cache construction must not consume the RNG)
    twin = ImageFolderSource(image_folder, img_size=IMG, seed=7)
    for _ in range(3):
        np.testing.assert_array_equal(cached.epoch_indices(), twin.epoch_indices())


def test_cached_pipeline_trains(image_folder):
    """The CLI composition: cache → iterate_batches → device_prefetch →
    encoded train step on the 8-device mesh."""
    mesh = create_mesh(MeshSpec(data=8))
    task = latent_task(mesh)
    src = ImageFolderSource(image_folder, img_size=IMG, seed=0)
    cached = LatentCacheSource(src, task.make_encoder())
    state = task.init_state(0)
    step = task.make_train_step(encoded=True)
    n = 0
    for batch in device_prefetch(iterate_batches(cached, 8, epochs=2), mesh):
        state, m = step(state, batch["latent"], batch["label"])
        n += 1
    assert n == 2 and np.isfinite(float(m["train_mse"]))
