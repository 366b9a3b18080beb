"""Dynamic-batching generation server (capability beyond the reference).

The reference generates offline only (ddpm_conditional_generate.py). For
production serving the constraint is TPU-shaped: the reverse-diffusion chain
is one compiled program whose cost is nearly flat in batch size up to the
measured sweet spot (internal batch 54 = 27 labels × CFG on v5e — see
PARITY.md perf notes), so throughput comes from *filling* each chain, and
latency from not waiting too long to fill it.

Design:
  * ONE jitted sampler at a FIXED label-batch (`batch_size`) — every request
    shape-pads into it, so the 999/50-step scan never retraces or recompiles.
  * A coalescing queue: requests (label, count) are expanded into label
    slots; a worker thread drains up to `batch_size` slots, waiting at most
    `max_delay_ms` once the first slot arrives (classic dynamic batching).
  * Results are fanned back out to per-request futures; the HTTP layer
    (GenerationHTTPServer) serves them as base64 PNGs.

Single-host by design: multi-chip scaling uses the same data-axis sharding
as DiffusionTask.sample (labels sharded over the mesh), so one server
process drives a whole slice; scale-out beyond a slice is N processes
behind any HTTP load balancer.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from spectrogramgenai_tpu.audio.invert import AudioReconstructor


class _Slot:
    """One requested image: a label index and the future collecting it."""

    __slots__ = ("label", "future", "results", "want")

    def __init__(self, label: int, future: Future, results: list, want: int):
        self.label = label
        self.future = future
        self.results = results  # shared per-request accumulator
        self.want = want


class BatchingSampler:
    """Coalesce concurrent generation requests into fixed-shape sampler calls.

    Parameters
    ----------
    task, state : a DiffusionTask and its (restored) TrainState.
    batch_size : compiled label-batch per chain; requests pad into it.
    max_delay_ms : max time the worker waits to fill a batch after the
        first request arrives (the latency/throughput knob).
    sampler, num_steps, use_ema, cfg_scale : forwarded to task.sample.

    Alternatively construct with `BatchingSampler.from_artifact(...)` to
    serve an exported StableHLO sampler (serving/export.py) — no task,
    state, or model code involved.
    """

    def __init__(self, task, state, *, batch_size: int = 27, max_delay_ms: float = 50.0,
                 sampler: str = "dpmpp", num_steps: int = 20, use_ema: bool = False,
                 cfg_scale: float | None = None, seed: int = 0, artifact=None,
                 force_batch: bool = False):
        import jax

        from spectrogramgenai_tpu.core.limits import check_sampling_label_batch

        self.task = task
        self.state = state
        self._artifact = artifact
        if artifact is not None:  # the artifact froze these at export time
            batch_size = artifact.num_labels
            sampler = artifact.manifest["sampler"]
            num_steps = artifact.manifest["num_steps"]
            use_ema = artifact.manifest["use_ema"]
            cfg_scale = artifact.manifest["cfg_scale"]
        # refuse worker-killing batches before anything compiles (an operator
        # typo on --serve_batch must not cost ~10 min of chip downtime)
        check_sampling_label_batch(int(batch_size), force=force_batch)
        self.batch_size = int(batch_size)
        self.max_delay_s = max_delay_ms / 1000.0
        self.sampler = sampler
        self.num_steps = int(num_steps)
        self.use_ema = use_ema
        self.cfg_scale = cfg_scale
        self.last_device_error: str | None = None
        self._key = jax.random.PRNGKey(seed)
        self._queue: queue.Queue[_Slot] = queue.Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "images": 0, "batches": 0,
                      "slots_filled": 0, "slots_padded": 0, "busy_seconds": 0.0,
                      "encode_seconds": 0.0, "audio_seconds": 0.0}
        self._worker = threading.Thread(target=self._run, name="sampler-worker", daemon=True)
        self._worker.start()

    @classmethod
    def from_artifact(cls, artifact, *, max_delay_ms: float = 50.0, seed: int = 0,
                      force_batch: bool = False):
        """Serve an exported StableHLO sampler (serving/export.py): the
        artifact fixes batch size, sampler type, steps, and CFG scale."""
        return cls(None, None, artifact=artifact, max_delay_ms=max_delay_ms, seed=seed,
                   force_batch=force_batch)

    @property
    def num_classes(self) -> int:
        if self._artifact is not None:
            return self._artifact.manifest["num_classes"]
        return self.task.cfg.num_classes

    # -- client API -------------------------------------------------------------
    def submit(self, label: int, count: int = 1) -> Future:
        """Request `count` images of class `label`; resolves to (count, H, W, C) uint8."""
        if not (1 <= count <= 1024):
            raise ValueError(f"count out of range: {count}")
        fut: Future = Future()
        results: list = []
        with self._lock:
            self.stats["requests"] += 1
        for _ in range(count):
            self._queue.put(_Slot(int(label), fut, results, count))
        return fut

    def close(self):
        self._stop.set()
        self._worker.join(timeout=10)

    # -- worker -----------------------------------------------------------------
    def _take_batch(self) -> list[_Slot]:
        """Block for the first slot, then fill greedily until batch_size or
        max_delay_ms elapses."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        slots = [first]
        deadline = time.monotonic() + self.max_delay_s
        while len(slots) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                slots.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return slots

    def _run(self):
        import jax
        import jax.numpy as jnp

        while not self._stop.is_set():
            slots = self._take_batch()
            if not slots:
                continue
            labels = np.zeros((self.batch_size,), np.int32)  # pad slots sample class 0, discarded
            labels[: len(slots)] = [s.label for s in slots]
            self._key, k = jax.random.split(self._key)
            t0 = time.monotonic()
            try:
                if self._artifact is not None:
                    imgs = self._artifact(int(jax.random.randint(k, (), 0, 2**31 - 1)), labels)
                else:
                    imgs = np.asarray(
                        self.task.sample(self.state, k, jnp.asarray(labels),
                                         use_ema=self.use_ema, cfg_scale=self.cfg_scale,
                                         sampler=self.sampler, num_steps=self.num_steps)
                    )
            except Exception as e:  # surface device failures to every waiting client
                self.last_device_error = f"{type(e).__name__}: {e}"
                for s in slots:
                    if not s.future.done():
                        s.future.set_exception(e)
                continue
            dt = time.monotonic() - t0
            with self._lock:
                self.stats["batches"] += 1
                self.stats["slots_filled"] += len(slots)
                self.stats["slots_padded"] += self.batch_size - len(slots)
                self.stats["images"] += len(slots)
                self.stats["busy_seconds"] += dt
            for i, s in enumerate(slots):
                s.results.append(imgs[i])
                if len(s.results) == s.want and not s.future.done():
                    s.future.set_result(np.stack(s.results))

    def add_encode_seconds(self, dt: float) -> None:
        """Handler threads report PNG-encode wall time here so /stats splits
        device sampling (busy_seconds) from host response encoding."""
        with self._lock:
            self.stats["encode_seconds"] += dt

    def add_audio_seconds(self, dt: float) -> None:
        """Wall time spent in on-device audio reconstruction (audio=true)."""
        with self._lock:
            self.stats["audio_seconds"] += dt

    def snapshot_stats(self) -> dict:
        with self._lock:
            s = dict(self.stats)
        busy = s.pop("busy_seconds")
        s["busy_seconds"] = round(busy, 3)
        s["encode_seconds"] = round(s["encode_seconds"], 3)
        s["audio_seconds"] = round(s["audio_seconds"], 3)
        if busy > 0:
            s["images_per_sec_busy"] = round(s["images"] / busy, 3)
        if s["batches"] > 0:
            s["mean_occupancy"] = round(s["slots_filled"] / (s["batches"] * self.batch_size), 3)
        return s


def _png_bytes(img: np.ndarray) -> bytes:
    """uint8 (H, W, 1) or (H, W) → viridis RGBA PNG bytes — in-memory
    equivalent of audio/export.save_generated_png (diff_modules.py:771-775),
    so HTTP-served samples are pixel-compatible with the offline generate
    CLI's output. Pre-colormapped (H, W, 3) input passes through unchanged."""
    from PIL import Image

    from spectrogramgenai_tpu.audio.export import _viridis_rgba

    arr = img[..., 0] if img.ndim == 3 and img.shape[-1] == 1 else img
    if arr.ndim == 2:  # grayscale sample → same viridis map as the CLI
        arr = _viridis_rgba(arr.astype(np.float32) / 255.0)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _png_bytes_batch(imgs: np.ndarray) -> list[bytes]:
    """Batch viridis-PNG encode for a whole response, through the native C++
    encoder (native/png_batch.cpp png_batch_encode_rgb — no file round-trip).
    A/B under 108-request DDIM-50 load (same warm server, 27-class artifact):
    handler encode time 2.8-3.0 s (PIL per-image zlib-6) → 1.2-1.9 s summed
    per 108 images; wall throughput is parity on this 1-core VM (client
    threads share the core), the freed host time matters on real hosts.
    RGB output; pixel-equivalent to _png_bytes' RGBA (viridis alpha ≡ 255)
    for any consumer incl. the grayscale training read-back. Falls back to
    the per-image PIL path when the native library is unavailable."""
    imgs = np.asarray(imgs)
    if imgs.ndim == 4 and imgs.shape[-1] == 1:
        imgs = imgs[..., 0]
    if imgs.ndim == 3:  # [n, H, W] grayscale → batched viridis LUT
        from spectrogramgenai_tpu.audio.export import _viridis_lut
        from spectrogramgenai_tpu.data.native_png import encode_png_batch_rgb

        idx = np.clip(imgs.astype(np.int32), 0, 255)
        rgb = np.ascontiguousarray(_viridis_lut()[idx])
        encoded = encode_png_batch_rgb(rgb, num_threads=4)
        if encoded is not None:
            return encoded
    return [_png_bytes(im) for im in imgs]


class GenerationHTTPServer:
    """Minimal production HTTP front end over a BatchingSampler.

    Endpoints:
      GET  /healthz            → {"ok": true, "backend": "...", "classes": N}
      GET  /stats              → batching/throughput counters
      POST /generate           → {"label": int|str, "count": int} →
                                 {"label": i, "images": [<base64 png>, ...]};
                                 with "audio": true, also reconstructs
                                 waveforms on device (Griffin-Lim inversion)
                                 → {..., "audio": [<base64 wav>, ...],
                                    "sample_rate": sr}
    """

    def __init__(self, sampler: BatchingSampler, class_names: list[str] | None = None,
                 host: str = "127.0.0.1", port: int = 8000,
                 request_timeout_s: float = 600.0,
                 audio: AudioReconstructor | None = None):
        import jax

        backend = jax.default_backend()
        audio_rec = audio if audio is not None else AudioReconstructor()
        names = class_names or []
        name_to_idx = {n: i for i, n in enumerate(names)}
        num_classes = sampler.num_classes
        timeout_s = request_timeout_s

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default; stats endpoint instead
                pass

            def _json(self, code: int, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    # a device failure (e.g. TPU worker restart) is not
                    # recoverable in-process — report unhealthy so a
                    # supervisor/load balancer can restart or drain us
                    err = sampler.last_device_error
                    self._json(200 if err is None else 503,
                               {"ok": err is None, "backend": backend,
                                "classes": num_classes,
                                **({"device_error": err} if err else {})})
                elif self.path == "/stats":
                    self._json(200, sampler.snapshot_stats())
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/generate":
                    return self._json(404, {"error": "not found"})
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    label = req.get("label", 0)
                    if isinstance(label, str):
                        if label not in name_to_idx:
                            return self._json(400, {"error": f"unknown class {label!r}"})
                        label = name_to_idx[label]
                    label = int(label)
                    if not (0 <= label < num_classes):
                        return self._json(400, {"error": f"label out of range: {label}"})
                    count = int(req.get("count", 1))
                    if not (1 <= count <= 256):
                        return self._json(400, {"error": f"count out of range: {count}"})
                    want_audio = bool(req.get("audio", False))
                except (ValueError, json.JSONDecodeError) as e:
                    return self._json(400, {"error": str(e)})
                try:
                    imgs = sampler.submit(label, count).result(timeout=timeout_s)
                except Exception as e:
                    return self._json(500, {"error": f"{type(e).__name__}: {e}"})
                t_enc = time.monotonic()
                payload = [base64.b64encode(b).decode() for b in _png_bytes_batch(imgs)]
                sampler.add_encode_seconds(time.monotonic() - t_enc)
                resp = {"label": label, "images": payload}
                if want_audio:
                    try:
                        t_au = time.monotonic()
                        wavs = audio_rec.wav_bytes_batch(imgs)
                        sampler.add_audio_seconds(time.monotonic() - t_au)
                        resp["audio"] = [base64.b64encode(b).decode() for b in wavs]
                        resp["sample_rate"] = audio_rec.output_sample_rate
                    except Exception as e:
                        return self._json(500, {"error": f"audio: {type(e).__name__}: {e}"})
                self._json(200, resp)

        # default request_queue_size (5) overflows under bursty concurrent
        # load — 100+ simultaneous connections on a busy host fill the accept
        # backlog before the accept loop gets scheduled and the kernel RSTs
        # the overflow (measured: resets at 108 concurrent requests, 1-core)
        class _Server(ThreadingHTTPServer):
            request_queue_size = 128
            daemon_threads = True

        self._httpd = _Server((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self):
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        name="http-server", daemon=True)
        self._thread.start()

    def serve_forever(self):
        self._httpd.serve_forever()

    def shutdown(self):
        self._httpd.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=10)
        self._httpd.server_close()
