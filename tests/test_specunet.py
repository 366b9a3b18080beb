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


def test_transformer_denoiser_forward_contract():
    # M4 direct: 256² → 5-conv stride-2 encoder → 64 tokens d=512 transformer
    # → transposed-conv decoder → tanh 1ch output, same spatial size
    import jax
    import numpy as np

    from spectrogramgenai_tpu.models.denoiser import TransformerDenoiser

    net = TransformerDenoiser(num_layers=1)  # tiny but real stack
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 256, 1))
    variables = net.init(jax.random.PRNGKey(1), x)
    out = net.apply(variables, x)
    assert out.shape == (2, 256, 256, 1)
    o = np.asarray(out)
    assert (o >= -1.0).all() and (o <= 1.0).all()  # tanh head

    # the residual application contract (train_acgan.py:211-215):
    # x ← renorm(x − net(x)) stays in [-1, 1] per sample
    from spectrogramgenai_tpu.data.transforms import renorm_m1_1

    denoised = np.asarray(renorm_m1_1(x - out))
    assert denoised.min() >= -1.0 - 1e-5 and denoised.max() <= 1.0 + 1e-5
