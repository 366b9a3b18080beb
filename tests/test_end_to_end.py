"""Full-workflow integration test (tiny, CPU, 8-device mesh):

synthetic wavs → gen_specs CLI → image folders → VQ-VAE training →
latent DDPM training → conditional generation PNGs → classifier training
on the real+synthetic mix. Exercises every layer end to end.
"""

import os

import numpy as np
import pandas as pd
import pytest
from scipy.io import wavfile

SR = 22050
CLASSES = ["bird_a", "bird_b"]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Synthetic wavs → spectrogram PNG folders (train/val) via the CLI."""
    from spectrogramgenai_tpu.cli.gen_specs import run as gen_specs_run

    root = tmp_path_factory.mktemp("e2e")
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir)
    rng = np.random.default_rng(0)
    rows = []
    for ci, cname in enumerate(CLASSES):
        for i in range(6):
            t = np.arange(SR * 7) / SR
            f0 = 1200 + 1500 * ci + 60 * i
            wav = np.sin(2 * np.pi * f0 * t) * np.exp(-0.5 * t) + 0.05 * rng.standard_normal(len(t))
            name = f"{cname}_{i}.wav"
            wavfile.write(os.path.join(wav_dir, name), SR, (wav * 16000).astype(np.int16))
            rows.append({"file_name": name, "begin_time": 0, "end_time": 7, "common_name": cname})
    manifest = os.path.join(root, "manifest.csv")
    pd.DataFrame(rows).to_csv(manifest, index=False)

    flat_dir = os.path.join(root, "flat")
    n = gen_specs_run(manifest, wav_dir, flat_dir, batch_size=4)
    assert n == len(rows)

    # arrange into class-subdir train/val ImageFolder trees
    import shutil

    for split, take in (("train", slice(0, 4)), ("val", slice(4, 6))):
        for ci, cname in enumerate(CLASSES):
            d = os.path.join(root, split, cname)
            os.makedirs(d, exist_ok=True)
            for i in list(range(6))[take]:
                src = os.path.join(flat_dir, f"{cname}_{i}.wav_0_0.png")
                shutil.copy(src, os.path.join(d, f"{cname}_{i}.png"))
    return str(root)


def test_full_workflow(dataset):
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.core.config import DDPMConfig, DataConfig, RunConfig, VQVAEConfig, ClassifierConfig
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh, shard_batch
    from spectrogramgenai_tpu.data.pipeline import ImageFolderSource, iterate_batches
    from spectrogramgenai_tpu.train.classifier_task import ClassifierTask
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask
    from spectrogramgenai_tpu.train.vqvae_task import VQVAETask

    img = 32
    mesh = create_mesh(MeshSpec(data=8))
    train_src = ImageFolderSource(os.path.join(dataset, "train"), bootstrap_balance=True,
                                  img_size=img, seed=0)
    assert train_src.classes == CLASSES

    # --- VQ-VAE ------------------------------------------------------------
    vq_cfg = VQVAEConfig(hidden_dim=32, n_embeddings=32, run=RunConfig(seed=0),
                         data=DataConfig(batch_size=8, img_size=img), compute_dtype="float32")
    vq_task = VQVAETask(vq_cfg, mesh)
    vq_state = vq_task.init_state(img_size=img)
    vq_step = vq_task.make_train_step()
    for batch in iterate_batches(train_src, 8, epochs=6):
        sharded = shard_batch(mesh, batch)
        vq_state, vq_m = vq_step(vq_state, sharded["image"])
    assert np.isfinite(float(vq_m["loss"]))

    # --- latent DDPM on the frozen VQ-VAE -----------------------------------
    dd_cfg = DDPMConfig(img_size=img, latent=True, noise_steps=16, num_classes=len(CLASSES),
                        width_mult=0.25, remove_deep_conv=True, lr=1e-3,
                        vq_hidden_dim=32, vq_n_embeddings=32,
                        compute_dtype="float32", run=RunConfig(seed=0),
                        data=DataConfig(batch_size=8, img_size=img))
    dd_task = DiffusionTask(dd_cfg, mesh, total_steps=20, vq_variables=vq_task.variables(vq_state))
    dd_state = dd_task.init_state(0)
    dd_step = dd_task.make_train_step()
    for batch in iterate_batches(train_src, 8, epochs=4):
        sharded = shard_batch(mesh, batch)
        dd_state, dd_m = dd_step(dd_state, sharded["image"], sharded["label"])
    assert np.isfinite(float(dd_m["train_mse"]))

    # --- conditional generation → PNGs --------------------------------------
    from spectrogramgenai_tpu.audio.export import save_generated_png

    labels = jnp.arange(len(CLASSES), dtype=jnp.int32)
    imgs = np.asarray(dd_task.sample(dd_state, jax.random.PRNGKey(0), labels))
    assert imgs.shape == (2, img, img, 1) and imgs.dtype == np.uint8
    gen_dir = os.path.join(dataset, "gen")
    for samp in range(3):
        for i, cname in enumerate(CLASSES):
            save_generated_png(imgs[i], os.path.join(gen_dir, f"{cname}_gen_imgs_{i}_{samp}.png"))

    # --- classifier on real + synthetic mix ---------------------------------
    from spectrogramgenai_tpu.cli.train_classifiers import _inject_synthetic, evaluate

    cls_src = ImageFolderSource(os.path.join(dataset, "train"), img_size=img, seed=0)
    n_before = len(cls_src.paths)
    _inject_synthetic(cls_src, gen_dir, per_class=2, cap=250, seed=0)
    assert len(cls_src.paths) == n_before + 4

    cls_cfg = ClassifierConfig(model_name="custom", num_classes=len(CLASSES),
                               data=DataConfig(batch_size=8, img_size=img),
                               run=RunConfig(seed=0), compute_dtype="float32")
    cls_task = ClassifierTask(cls_cfg, mesh)
    cls_state = cls_task.init_state(img_size=img)
    cls_step = cls_task.make_train_step()
    for batch in iterate_batches(cls_src, 8, epochs=40):
        sharded = shard_batch(mesh, batch)
        cls_state, cls_m = cls_step(cls_state, sharded["image"], sharded["label"])
    assert np.isfinite(float(cls_m["train_loss"]))

    val_src = ImageFolderSource(os.path.join(dataset, "val"), img_size=img)
    metrics = evaluate(cls_task, cls_state, val_src, mesh, 4, len(CLASSES)).compute()
    # two tones far apart — the real samples should separate well even with
    # the (untrained-DDPM) synthetic images mixed into training
    assert metrics["micro_accuracy"] >= 0.5, metrics
