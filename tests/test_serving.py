"""Serving layer: dynamic batching semantics + HTTP front end (tiny model, CPU)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

from spectrogramgenai_tpu.core.config import DDPMConfig, RunConfig
from spectrogramgenai_tpu.core.mesh import MeshSpec, create_mesh
from spectrogramgenai_tpu.serving import BatchingSampler, GenerationHTTPServer
from spectrogramgenai_tpu.train.diffusion_task import DiffusionTask


@pytest.fixture(scope="module")
def tiny_task():
    cfg = DDPMConfig(img_size=16, latent=False, num_classes=3, noise_steps=8,
                     width_mult=0.125, remove_deep_conv=True,
                     compute_dtype="float32", run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    task = DiffusionTask(cfg, mesh, total_steps=1)
    state = task.init_state(0)
    return task, state


def test_batching_sampler_coalesces(tiny_task):
    task, state = tiny_task
    b = BatchingSampler(task, state, batch_size=4, max_delay_ms=200.0,
                        sampler="ddim", num_steps=4)
    try:
        futs = [b.submit(i % 3) for i in range(4)]
        outs = [f.result(timeout=120) for f in futs]
        for o in outs:
            assert o.shape == (1, 16, 16, 1) and o.dtype == np.uint8
        stats = b.snapshot_stats()
        # 4 concurrent single-image requests within one 200ms window must
        # coalesce into ONE fixed-shape chain
        assert stats["batches"] == 1
        assert stats["slots_filled"] == 4 and stats["slots_padded"] == 0
        assert stats["mean_occupancy"] == 1.0

        # multi-image request resolves once all its slots are sampled
        out = b.submit(2, count=3).result(timeout=120)
        assert out.shape == (3, 16, 16, 1)
        assert b.snapshot_stats()["images"] == 7
    finally:
        b.close()


def test_batching_sampler_splits_oversize(tiny_task):
    task, state = tiny_task
    b = BatchingSampler(task, state, batch_size=2, max_delay_ms=10.0,
                        sampler="ddim", num_steps=4)
    try:
        out = b.submit(1, count=5).result(timeout=120)  # 5 slots > batch 2 → 3 chains
        assert out.shape == (5, 16, 16, 1)
        assert b.snapshot_stats()["batches"] == 3
    finally:
        b.close()


def test_http_server_generate_and_stats(tiny_task):
    task, state = tiny_task
    b = BatchingSampler(task, state, batch_size=4, max_delay_ms=20.0,
                        sampler="ddim", num_steps=4)
    server = GenerationHTTPServer(b, ["bird_a", "bird_b", "bird_c"], port=0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["classes"] == 3

        req = urllib.request.Request(
            f"{base}/generate",
            data=json.dumps({"label": "bird_b", "count": 2}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.loads(r.read())
        assert body["label"] == 1 and len(body["images"]) == 2
        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
        assert img.size == (16, 16)
        # served PNGs are viridis-colormapped, same contract as the
        # offline generate CLI (audio/export.save_generated_png)
        assert img.mode in ("RGB", "RGBA")

        # concurrent clients exercise the coalescing path through HTTP
        results = []

        def hit(lbl):
            rq = urllib.request.Request(f"{base}/generate",
                                        data=json.dumps({"label": lbl}).encode(),
                                        method="POST")
            with urllib.request.urlopen(rq, timeout=300) as rr:
                results.append(json.loads(rr.read()))

        threads = [threading.Thread(target=hit, args=(i % 3,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4 and all(len(r["images"]) == 1 for r in results)

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["images"] >= 6 and stats["batches"] >= 1
        assert "images_per_sec_busy" in stats

        # error paths: bad label / bad count are 400s, not crashes
        for payload in ({"label": "nope"}, {"label": 99}, {"count": 0}):
            rq = urllib.request.Request(f"{base}/generate",
                                        data=json.dumps(payload).encode(), method="POST")
            try:
                urllib.request.urlopen(rq, timeout=30)
                assert False, f"expected 400 for {payload}"
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        server.shutdown()
        b.close()


def test_artifact_backed_serving(tiny_task):
    # serve an exported StableHLO artifact: no task/state/model code involved
    from spectrogramgenai_tpu.serving.export import ExportedSampler, export_sampler

    task, state = tiny_task
    art = ExportedSampler(export_sampler(task, state, num_labels=2,
                                         sampler="ddim", num_steps=4))
    b = BatchingSampler.from_artifact(art, max_delay_ms=10.0)
    server = GenerationHTTPServer(b, ["a", "b", "c"], port=0)
    server.start()
    try:
        assert b.num_classes == 3 and b.batch_size == 2
        out = b.submit(1, count=3).result(timeout=120)  # 3 slots through batch 2
        assert out.shape == (3, 16, 16, 1) and out.dtype == np.uint8

        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/generate",
            data=json.dumps({"label": "c"}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        assert body["label"] == 2 and len(body["images"]) == 1
    finally:
        server.shutdown()
        b.close()


def test_healthz_degrades_on_device_error(tiny_task):
    task, state = tiny_task
    b = BatchingSampler(task, state, batch_size=2, max_delay_ms=10.0,
                        sampler="ddim", num_steps=4)
    server = GenerationHTTPServer(b, port=0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"]

        # simulate an unrecoverable device failure in the worker
        def boom(*a, **k):
            raise RuntimeError("TPU worker process crashed")

        b.task = type("T", (), {"sample": staticmethod(boom),
                                "cfg": task.cfg})()
        with pytest.raises(Exception):
            b.submit(0).result(timeout=60)
        try:
            urllib.request.urlopen(f"{base}/healthz", timeout=30)
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            body = json.loads(e.read())
            assert not body["ok"] and "crashed" in body["device_error"]
    finally:
        server.shutdown()
        b.close()


def test_serving_on_multichip_mesh():
    # one server process drives a whole slice: labels shard over the data
    # axis inside task.sample when the batch divides the mesh
    cfg = DDPMConfig(img_size=16, latent=False, num_classes=8, noise_steps=8,
                     width_mult=0.125, remove_deep_conv=True,
                     compute_dtype="float32", run=RunConfig(seed=0))
    mesh = create_mesh(MeshSpec(data=8))
    task = DiffusionTask(cfg, mesh, total_steps=1)
    state = task.init_state(0)
    b = BatchingSampler(task, state, batch_size=8, max_delay_ms=50.0,
                        sampler="ddim", num_steps=4)
    try:
        futs = [b.submit(i) for i in range(8)]
        outs = [f.result(timeout=300) for f in futs]
        assert all(o.shape == (1, 16, 16, 1) for o in outs)
        assert b.snapshot_stats()["batches"] <= 2  # coalesced across the mesh
    finally:
        b.close()


def test_http_server_audio_reconstruction(tiny_task):
    # "audio": true responses carry base64 WAVs reconstructed on device
    # (Griffin-Lim inversion of the served spectrograms)
    from scipy.io import wavfile

    from spectrogramgenai_tpu.serving import AudioReconstructor

    task, state = tiny_task
    b = BatchingSampler(task, state, batch_size=2, max_delay_ms=10.0,
                        sampler="ddim", num_steps=4)
    rec = AudioReconstructor(sample_rate=8000, n_fft=256, hop_length=64,
                             gl_iters=4, nnls_iters=8)
    server = GenerationHTTPServer(b, ["a", "b", "c"], port=0, audio=rec)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        req = urllib.request.Request(
            f"{base}/generate",
            data=json.dumps({"label": 0, "count": 2, "audio": True}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.loads(r.read())
        assert len(body["images"]) == 2 and len(body["audio"]) == 2
        assert body["sample_rate"] == 8000
        sr, data = wavfile.read(io.BytesIO(base64.b64decode(body["audio"][0])))
        assert sr == 8000 and data.dtype == np.int16
        assert data.shape == ((16 - 1) * 64,)  # (T-1)·hop samples
        stats = b.snapshot_stats()
        assert stats["audio_seconds"] > 0

        # without the flag the response has no audio key (and no cost)
        req = urllib.request.Request(
            f"{base}/generate", data=json.dumps({"label": 0}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.loads(r.read())
        assert "audio" not in body
    finally:
        server.shutdown()
        b.close()


def test_audio_reconstructor_resamples_and_buckets():
    from scipy.io import wavfile

    from spectrogramgenai_tpu.serving import AudioReconstructor

    rec = AudioReconstructor(sample_rate=8000, n_fft=256, hop_length=64,
                             gl_iters=2, nnls_iters=4, out_sr=16000)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (3, 16, 16, 1), dtype=np.uint8)  # pads to bucket 4
    wavs = rec.wav_bytes_batch(imgs)
    assert len(wavs) == 3
    assert rec.output_sample_rate == 16000
    sr, data = wavfile.read(io.BytesIO(wavs[0]))
    assert sr == 16000 and data.shape == (2 * (16 - 1) * 64,)
