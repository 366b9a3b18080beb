"""StableHLO sampler export: roundtrip fidelity + artifact contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spectrogramgenai_tpu.core.config import DDPMConfig, RunConfig
from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
from spectrogramgenai_tpu.serving.export import ExportedSampler, export_sampler
from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask


@pytest.fixture(scope="module")
def tiny():
    cfg = DDPMConfig(img_size=16, latent=False, num_classes=3, noise_steps=8,
                     width_mult=0.125, remove_deep_conv=True,
                     compute_dtype="float32", run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = DiffusionTask(cfg, mesh, total_steps=1)
    return task, task.init_state(0)


def test_export_roundtrip_matches_task_sample(tiny):
    task, state = tiny
    blob = export_sampler(task, state, num_labels=3, sampler="ddim", num_steps=4)
    art = ExportedSampler(blob)
    assert art.manifest["num_classes"] == 3 and art.manifest["sampler"] == "ddim"

    labels = np.array([0, 1, 2], np.int32)
    got = art(7, labels)
    want = np.asarray(task.sample(state, jax.random.PRNGKey(7), jnp.asarray(labels),
                                  sampler="ddim", num_steps=4))
    assert got.shape == (3, 16, 16, 1) and got.dtype == np.uint8
    # weights are baked into the artifact — identical program, identical output
    np.testing.assert_array_equal(got, want)


def test_export_rejects_wrong_label_count(tiny):
    task, state = tiny
    art = ExportedSampler(export_sampler(task, state, num_labels=2,
                                         sampler="ddim", num_steps=2))
    with pytest.raises(ValueError, match="compiled for 2 labels"):
        art(0, np.zeros((5,), np.int32))


def test_export_future_format_rejected(tiny):
    import io
    import json
    import zipfile

    task, state = tiny
    blob = export_sampler(task, state, num_labels=1, sampler="ddim", num_steps=2)
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        manifest = json.loads(z.read("manifest.json"))
        payload = z.read("sampler.stablehlo")
    manifest["format_version"] = 999
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("manifest.json", json.dumps(manifest))
        z.writestr("sampler.stablehlo", payload)
    with pytest.raises(ValueError, match="newer than this runtime"):
        ExportedSampler(buf.getvalue())


def test_generate_cli_from_artifact(tiny, tmp_path):
    # the offline generation contract ({class}_gen_imgs_{i}_{samp}.png)
    # works straight from an exported artifact — no checkpoint or config
    import os

    from spectrogramgenai_tpu.cli.generate import run as generate_run
    from spectrogramgenai_tpu.serving.export import export_sampler, save_artifact

    task, state = tiny
    blob = export_sampler(task, state, num_labels=6, sampler="ddim", num_steps=4)
    art_path = str(tmp_path / "sampler.shlo")
    save_artifact(art_path, blob)

    out = str(tmp_path / "gen")
    names = ["a", "b", "c"]
    generate_run(None, out, num_samples=3, start_idx=0, class_names=names,
                 artifact=art_path)
    files = sorted(os.listdir(out))
    # 3 rounds × 3 classes; batch 6 = 2 rounds/chain → chains of 2 then 1
    assert len(files) == 9
    assert "a_gen_imgs_0_0.png" in files and "c_gen_imgs_2_2.png" in files
