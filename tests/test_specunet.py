"""SpecUNet / denoiser task tests (tiny transformer, CPU mesh)."""

import numpy as np

from spectrogramgenai_tpu.core.config import DataConfig, RunConfig, SpecUNetConfig
from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh, shard_batch
from spectrogramgenai_tpu.train.specunet_task import SpecUNetTask


def _run_steps(mode, steps=4):
    cfg = SpecUNetConfig(mode=mode, run=RunConfig(seed=0),
                         data=DataConfig(batch_size=8), compute_dtype="float32")
    mesh = create_mesh(MeshSpec(data=8))
    task = SpecUNetTask(cfg, mesh)
    state = task.init_state(img_size=256)
    step = task.make_train_step()
    rng = np.random.default_rng(0)
    for _ in range(steps):
        mix = rng.uniform(-1, 1, (8, 256, 256, 1)).astype(np.float32)
        noise = rng.uniform(-1, 1, (8, 256, 256, 1)).astype(np.float32)
        bird = rng.uniform(-1, 1, (8, 256, 256, 1)).astype(np.float32)
        batch = shard_batch(mesh, {"mix": mix, "noise": noise, "bird": bird})
        state, m = step(state, batch["mix"], batch["noise"], batch["bird"])
    return task, state, batch, m


def test_separate_mode():
    task, state, batch, m = _run_steps("separate", steps=3)
    assert np.isfinite(float(m["train_mse"]))
    pred_noise, pred_bird = task.separate(state, batch["mix"])
    assert pred_noise.shape == (8, 256, 256, 1) and pred_bird.shape == (8, 256, 256, 1)


def test_denoise_mode():
    task, state, batch, m = _run_steps("denoise", steps=3)
    assert task.model.out_channels == 1
    assert np.isfinite(float(m["train_mse"]))
