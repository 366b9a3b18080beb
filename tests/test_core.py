"""Core layer tests: checkpoint save/restore/best, config CLI overrides,
EMA warmup semantics, metrics sink, mesh construction."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from spectrogramgenai_tpu.core.checkpoint import CheckpointManager
from spectrogramgenai_tpu.core.config import DDPMConfig, parse_config
from spectrogramgenai_tpu.core.ema import ema_init, ema_update
from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh, local_batch_size
from spectrogramgenai_tpu.core.metrics import MetricsLogger


def test_checkpoint_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
    mgr.save(7, state)
    mgr.save(14, {"params": {"w": jnp.arange(4.0) * 2}, "step": jnp.asarray(14)})
    mgr.save(21, {"params": {"w": jnp.arange(4.0) * 3}, "step": jnp.asarray(21)}, best=True, metric=0.9)

    assert mgr.all_steps() == [14, 21]  # max_to_keep=2 GC'd step 7
    restored = mgr.restore(state)
    assert int(restored["step"]) == 21
    np.testing.assert_allclose(restored["params"]["w"], np.arange(4.0) * 3)

    best = mgr.restore(state, best=True)
    assert int(best["step"]) == 21
    assert mgr.meta(best=True)["metric"] == 0.9

    restored14 = mgr.restore(state, step=14)
    np.testing.assert_allclose(restored14["params"]["w"], np.arange(4.0) * 2)


def test_checkpoint_legacy_sa_key_migration(tmp_path):
    """Pre-r2 checkpoints used flax auto-generated SA module names
    (SpatialSelfAttention_N / CheckpointSpatialSelfAttention_N under remat);
    restore must migrate them into the stable sa_N tree."""
    from flax import serialization

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    legacy = {"params": {
        "SpatialSelfAttention_0": {"w": jnp.ones(3)},
        "CheckpointSpatialSelfAttention_5": {"w": jnp.full(3, 2.0)},
        "outc": {"kernel": jnp.zeros(2)},
    }}
    # write a checkpoint with the legacy key layout directly
    mgr._write(mgr._step_dir(1), serialization.to_bytes(jax.device_get(legacy)),
               {"step": 1, "metric": None})

    target = {"params": {
        "sa_0": {"w": jnp.zeros(3)},
        "sa_5": {"w": jnp.zeros(3)},
        "outc": {"kernel": jnp.ones(2)},
    }}
    restored = mgr.restore(target)
    np.testing.assert_allclose(restored["params"]["sa_0"]["w"], 1.0)
    np.testing.assert_allclose(restored["params"]["sa_5"]["w"], 2.0)
    np.testing.assert_allclose(restored["params"]["outc"]["kernel"], 0.0)


def test_config_overrides():
    cfg = parse_config(DDPMConfig, ["--lr", "0.001", "--data.batch_size", "32",
                                    "--run.run_name", "exp1", "--latent", "false"])
    assert cfg.lr == 0.001
    assert cfg.data.batch_size == 32
    assert cfg.run.run_name == "exp1"
    assert cfg.latent is False
    assert cfg.noise_steps == 1000  # untouched defaults


def test_ema_warmup_then_lerp():
    params = {"w": jnp.ones(3)}
    ema = ema_init(params)
    new_params = {"w": jnp.full(3, 2.0)}
    # warmup: copy
    ema = ema_update(ema, new_params, step=jnp.asarray(10), beta=0.995, step_start=2000)
    np.testing.assert_allclose(ema["w"], 2.0)
    # after warmup: lerp
    ema = ema_update(ema, {"w": jnp.full(3, 4.0)}, step=jnp.asarray(3000), beta=0.5, step_start=2000)
    np.testing.assert_allclose(ema["w"], 3.0)


def test_metrics_logger(tmp_path):
    run_dir = str(tmp_path / "run")
    with MetricsLogger(run_dir, csv_name="res.csv", csv_columns=["Epoch", "Loss"]) as m:
        m.log(1, loss=0.5, lr=1e-3)
        m.log(2, loss=0.25)
        m.log_csv_row({"Epoch": 0, "Loss": 0.5})
        m.log_csv_row({"Epoch": 1, "Loss": 0.25, "ignored": 1})
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2
    csv_lines = open(os.path.join(run_dir, "res.csv")).read().strip().splitlines()
    assert csv_lines[0] == "Epoch,Loss" and len(csv_lines) == 3


def test_metrics_log_artifact(tmp_path, monkeypatch):
    """Checkpoint-artifact upload (diff_modules.py:513-523 parity): no-op
    without wandb; with a wandb module, one Artifact logged per call."""
    import sys
    import types

    run_dir = str(tmp_path / "run")
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    (ckpt_dir / "state.msgpack").write_bytes(b"x")

    with MetricsLogger(run_dir) as m:  # no wandb → no-op
        assert m.log_artifact(str(ckpt_dir)) is False

    logged = []

    class FakeArtifact:
        def __init__(self, name, type, description=None, metadata=None):
            self.name, self.metadata = name, metadata
            self.dirs, self.files = [], []

        def add_dir(self, p):
            self.dirs.append(p)

        def add_file(self, p):
            self.files.append(p)

    fake = types.SimpleNamespace(
        run=object(), init=lambda **kw: None, log=lambda *a, **kw: None,
        finish=lambda: None, Artifact=FakeArtifact, log_artifact=logged.append)
    monkeypatch.setitem(sys.modules, "wandb", fake)
    with MetricsLogger(run_dir, use_wandb=True) as m:
        assert m.log_artifact(str(ckpt_dir), metadata={"epoch": 3}) is True
        assert m.log_artifact(str(ckpt_dir / "state.msgpack")) is True
    assert len(logged) == 2
    assert logged[0].dirs == [str(ckpt_dir)] and logged[0].metadata == {"epoch": 3}
    assert logged[1].files == [str(ckpt_dir / "state.msgpack")]


def test_metrics_log_images(tmp_path, monkeypatch):
    """Sampled-image panels (diff_modules.py:482-487 parity): no-op without
    wandb; with wandb, one wandb.Image per named panel at the given step."""
    import sys
    import types

    import numpy as np

    run_dir = str(tmp_path / "run")
    panel = np.zeros((8, 24), np.uint8)

    with MetricsLogger(run_dir) as m:  # no wandb → no-op
        assert m.log_images(1, {"sampled": panel}) is False

    calls = []

    class FakeImage:
        def __init__(self, arr):
            self.arr = arr

    fake = types.SimpleNamespace(
        run=object(), init=lambda **kw: None, finish=lambda: None,
        Image=FakeImage, log=lambda d, step=None: calls.append((d, step)))
    monkeypatch.setitem(sys.modules, "wandb", fake)
    with MetricsLogger(run_dir, use_wandb=True) as m:
        assert m.log_images(7, {"sampled": panel}) is True
    assert len(calls) == 1
    d, step = calls[0]
    assert step == 7 and isinstance(d["sampled"], FakeImage)
    assert d["sampled"].arr.shape == (8, 24)


def test_mesh_shapes():
    mesh = create_mesh(MeshSpec(data=-1, model=2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    assert local_batch_size(16, mesh) == 4
    mesh1 = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    assert mesh1.shape["data"] == 1


def test_trainstate_checkpoint_roundtrip(tmp_path):
    """Full TrainState (params + optimizer + EMA + rng) restores exactly."""
    import optax

    from spectrogramgenai_tpu.train.state import new_train_state

    tx = optax.adam(1e-3)
    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3), "bias": jnp.zeros(3)}}
    state = new_train_state(params, tx, jax.random.PRNGKey(3),
                            ema_params=jax.tree_util.tree_map(jnp.copy, params))
    state = state.replace(step=jnp.asarray(42))

    mgr = CheckpointManager(str(tmp_path / "ts"))
    mgr.save(42, state)
    template = new_train_state(
        jax.tree_util.tree_map(jnp.zeros_like, params), tx, jax.random.PRNGKey(0),
        ema_params=jax.tree_util.tree_map(jnp.zeros_like, params))
    restored = mgr.restore(template)
    assert int(restored.step) == 42
    np.testing.assert_allclose(restored.params["dense"]["kernel"], np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(restored.rng), np.asarray(jax.random.PRNGKey(3)))


def test_maybe_initialize_distributed(monkeypatch):
    """Both branches of the multi-host bring-up helper (core/mesh.py):
    no coordinator env → untouched; env present → jax.distributed.initialize
    is invoked exactly once when this process is not yet part of a cluster."""
    from spectrogramgenai_tpu.core import mesh as mesh_mod

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert mesh_mod.maybe_initialize_distributed() is False

    calls = []
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:12345")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: calls.append(kw))
    assert mesh_mod.maybe_initialize_distributed() is True
    assert calls == [{"coordinator_address": "localhost:12345",
                      "num_processes": 2, "process_id": 1}]
    # (the REAL 2-process bring-up — gloo collectives, loss parity — is
    # executed by tests/test_multiprocess.py)
