"""FSDP (ZeRO-3 style) parameter/optimizer/EMA sharding over the data axis.

The reference has no distributed training at all (SURVEY.md §2.5); this is a
framework capability: `RunConfig.param_sharding="fsdp"` shards every large
TrainState leaf (params, both Adam moments, the EMA copy) over the mesh's
data axis, XLA all-gathers weights per layer and reduce-scatters gradients
(GSPMD). Tests run on the 8-virtual-device CPU mesh (conftest).
"""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from spectrogramgenai_tpu.core.config import DDPMConfig, RunConfig
from spectrogramgenai_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, MeshSpec, create_mesh, shard_batch
from spectrogramgenai_tpu.train import common
from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask


def tiny_cfg(**kw):
    base = dict(
        epochs=1,
        noise_steps=8,
        img_size=16,
        num_classes=5,
        latent=False,
        lr=2e-3,
        width_mult=1.0,  # full-width bottleneck so large kernels exist
        remove_deep_conv=True,
        compute_dtype="float32",
        run=RunConfig(seed=0, param_sharding="fsdp"),
    )
    base.update(kw)
    return DDPMConfig(**base)


def _leaf_shard_fraction(leaf):
    """addressable shard bytes / full bytes for one leaf."""
    shard = leaf.addressable_shards[0].data
    return shard.nbytes / leaf.nbytes


def test_param_sharding_rule_modes():
    mesh = create_mesh(MeshSpec(data=4, model=2))
    big = jax.ShapeDtypeStruct((3, 3, 256, 512), np.float32)
    small = jax.ShapeDtypeStruct((64,), np.float32)

    assert common.param_sharding(mesh, big, mode="replicate").spec == P()
    assert common.param_sharding(mesh, big, mode="tp").spec == P(None, None, None, MODEL_AXIS)
    # fsdp picks the largest free dim divisible by data=4 → the output dim
    assert common.param_sharding(mesh, big, mode="fsdp").spec == P(None, None, None, DATA_AXIS)
    # combined: model claims the output dim, data takes the next-largest
    assert common.param_sharding(mesh, big, mode="tp_fsdp").spec == P(
        None, None, DATA_AXIS, MODEL_AXIS
    )
    # small leaves always replicate (below FSDP_MIN_SIZE / min_dim)
    for mode in common.SHARD_MODES:
        assert common.param_sharding(mesh, small, mode=mode).spec == P()

    try:
        common.param_sharding(mesh, big, mode="zap")
        raise AssertionError("expected ValueError for unknown mode")
    except ValueError:
        pass


def test_fsdp_shards_state_and_saves_memory():
    cfg = tiny_cfg()
    mesh = create_mesh(MeshSpec(data=8, model=1))
    task = DiffusionTask(cfg, mesh, total_steps=20)
    state = task.init_state(0)

    fracs = [
        _leaf_shard_fraction(leaf)
        for leaf in jax.tree_util.tree_leaves(state.params)
        if leaf.size >= common.FSDP_MIN_SIZE
    ]
    assert fracs, "expected large param leaves in the full-width UNet"
    assert all(abs(f - 1 / 8) < 1e-6 for f in fracs), fracs

    # optimizer moments and the EMA copy inherit the layout (the ZeRO win)
    opt_fracs = [
        _leaf_shard_fraction(leaf)
        for leaf in jax.tree_util.tree_leaves(state.opt_state)
        if getattr(leaf, "size", 0) >= common.FSDP_MIN_SIZE
    ]
    ema_fracs = [
        _leaf_shard_fraction(leaf)
        for leaf in jax.tree_util.tree_leaves(state.ema_params)
        if leaf.size >= common.FSDP_MIN_SIZE
    ]
    assert opt_fracs and all(abs(f - 1 / 8) < 1e-6 for f in opt_fracs)
    assert ema_fracs and all(abs(f - 1 / 8) < 1e-6 for f in ema_fracs)


def test_fsdp_step_matches_replicated():
    """Same seed, same data: an fsdp-sharded train step computes the same
    losses and parameters as the replicated baseline (GSPMD only changes
    layout, not math), and updated params STAY sharded across steps."""
    mesh = create_mesh(MeshSpec(data=8, model=1))
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, size=(3, 8, 16, 16, 1)).astype(np.float32)
    labels = rng.integers(0, 5, size=(3, 8)).astype(np.int32)

    results = {}
    for mode in ("replicate", "fsdp"):
        cfg = tiny_cfg(run=RunConfig(seed=0, param_sharding=mode))
        task = DiffusionTask(cfg, mesh, total_steps=20)
        state = task.init_state(0)
        step = task.make_train_step()
        losses = []
        for i in range(3):
            batch = shard_batch(mesh, {"image": images[i], "label": labels[i]})
            state, m = step(state, batch["image"], batch["label"])
            losses.append(float(m["train_mse"]))
        results[mode] = (losses, state)

    np.testing.assert_allclose(results["fsdp"][0], results["replicate"][0], rtol=2e-5)
    p_rep = jax.tree_util.tree_leaves(results["replicate"][1].params)
    p_fsdp = jax.tree_util.tree_leaves(results["fsdp"][1].params)
    for a, b in zip(p_rep, p_fsdp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-6)

    big = [x for x in p_fsdp if x.size >= common.FSDP_MIN_SIZE]
    assert big and all(abs(_leaf_shard_fraction(x) - 1 / 8) < 1e-6 for x in big), (
        "params lost their fsdp sharding after the donated train step"
    )


def test_tp_fsdp_combined_mesh_trains_and_samples():
    cfg = tiny_cfg(run=RunConfig(seed=0, param_sharding="tp_fsdp"))
    mesh = create_mesh(MeshSpec(data=4, model=2))
    task = DiffusionTask(cfg, mesh, total_steps=10)
    state = task.init_state(0)

    both_axes = [
        leaf
        for leaf in jax.tree_util.tree_leaves(state.params)
        if MODEL_AXIS in str(leaf.sharding.spec) and DATA_AXIS in str(leaf.sharding.spec)
    ]
    assert both_axes, "expected at least one kernel sharded on BOTH mesh axes"

    step = task.make_train_step()
    rng = np.random.default_rng(1)
    batch = shard_batch(
        mesh,
        {
            "image": rng.uniform(0, 1, size=(8, 16, 16, 1)).astype(np.float32),
            "label": rng.integers(0, cfg.num_classes, size=(8,)).astype(np.int32),
        },
    )
    state, m = step(state, batch["image"], batch["label"])
    assert np.isfinite(float(m["train_mse"]))

    # the full reverse chain runs straight off the fsdp-sharded params
    labels = np.arange(4, dtype=np.int32)
    imgs = task.sample(state, jax.random.PRNGKey(0), labels)
    assert imgs.shape == (4, 16, 16, 1) and imgs.dtype == np.uint8


def test_fsdp_checkpoint_roundtrip_restores_sharding(tmp_path):
    """Save an fsdp-sharded state, restore it: leaves land back on the target
    leaf's sharding (r3 device-placement fix composes with fsdp)."""
    from spectrogramgenai_tpu.core.checkpoint import CheckpointManager

    cfg = tiny_cfg()
    mesh = create_mesh(MeshSpec(data=8, model=1))
    task = DiffusionTask(cfg, mesh, total_steps=10)
    state = task.init_state(0)

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, state)
    restored = mgr.restore(state)

    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if hasattr(b, "sharding"):
            assert b.sharding == a.sharding, (a.sharding, b.sharding)
