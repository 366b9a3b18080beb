"""bf16 mixed-precision policy: bf16 compute, fp32 params, no GradScaler
(SURVEY.md §2.5 rebuild table — replaces the reference's fp16 autocast)."""


import numpy as np
import jax
import jax.numpy as jnp

from spectrogramgenai_tpu.core.config import (
    ACGANConfig,
    ClassifierConfig,
    DDPMConfig,
    SpecUNetConfig,
    VQVAEConfig,
)


def test_every_workload_defaults_to_bf16():
    for cfg_cls in (DDPMConfig, VQVAEConfig, ACGANConfig, ClassifierConfig, SpecUNetConfig):
        cfg = cfg_cls()
        assert cfg.compute_dtype == "bfloat16", cfg_cls.__name__


def test_bf16_model_keeps_fp32_params_and_fp32_output():
    from spectrogramgenai_tpu.models.unet import ConditionalUNet

    model = ConditionalUNet(num_classes=3, width_mult=0.125, remove_deep_conv=True,
                            dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                           jnp.zeros((1,), jnp.int32), jnp.ones((1,)))
    # flax dtype policy: params stay fp32 (master weights), compute casts down
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
    out = model.apply(variables, x, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
                      jnp.ones((1,)))
    assert out.dtype == jnp.float32  # loss math in fp32

    # intermediate compute actually runs in bf16: a bf16-vs-fp32 forward of
    # the same params must differ by bf16 rounding (but only slightly)
    f32 = ConditionalUNet(num_classes=3, width_mult=0.125, remove_deep_conv=True,
                          dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 1))
    a = np.asarray(model.apply(variables, x, jnp.ones((1,)), jnp.zeros((1,), jnp.int32),
                               jnp.ones((1,))))
    b = np.asarray(f32.apply(variables, x, jnp.ones((1,)), jnp.zeros((1,), jnp.int32),
                             jnp.ones((1,))))
    assert not np.array_equal(a, b)  # bf16 rounding happened
    np.testing.assert_allclose(a, b, atol=0.1)  # …and nothing worse


def test_bf16_train_step_keeps_fp32_state():
    from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
    from spectrogramgenai_tpu.core.config import RunConfig
    from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask

    cfg = DDPMConfig(img_size=16, latent=False, num_classes=3, noise_steps=8,
                     width_mult=0.125, remove_deep_conv=True,
                     compute_dtype="bfloat16", run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = DiffusionTask(cfg, mesh, total_steps=4)
    state = task.init_state(0)
    step = task.make_train_step()
    # non-constant images: renorm_m1_1 is 0/0-NaN on constant input, exactly
    # like the reference fast_resize_m1_1 (helpers.py:305-311)
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 1))
    labs = jnp.zeros((2,), jnp.int32)
    state, metrics = step(state, imgs, labs)
    assert jnp.isfinite(metrics["train_mse"])
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32  # optimizer state/master weights fp32
