"""Host-side input pipeline: decode → batch → prefetch → device shards.

Replaces torch DataLoader workers (SURVEY.md §2.5) with a thread-pooled
decode + double-buffered device prefetch keyed to the mesh: every batch is
``jax.device_put`` with batch-dim NamedSharding, so each chip receives only
its slice (per-host sharding on a multi-host slice falls out of the same
call via jax.make_array_from_process_local_data when needed).

Sources:
  * ImageFolderSource — class-subdirectory PNG tree (ImageFolder semantics)
    with optional bootstrap class balancing (diff_utils.py:80-111).
  * DataFrameImageSource — SpecDatasetIm/-Ind semantics (helpers.py:113-204):
    rows keyed {file}_{begin}_{begin}.png, label = index into class_names,
    optional BirdNET embedding vectors and acoustic-index vectors.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from typing import Iterator

import numpy as np

from spectrogramgenai_tpu.audio.export import load_image_grayscale, spec_png_name
from spectrogramgenai_tpu.data.manifest import bootstrap_balance_indices, scan_image_folder


def _probe_hw(path: str) -> tuple[int, int]:
    """(height, width) of an image file without a full decode (PIL header
    read for PNGs; .npy arrays load their header-described shape)."""
    if path.endswith(".npy"):
        arr = np.load(path, mmap_mode="r")
        return int(arr.shape[0]), int(arr.shape[1])
    from PIL import Image

    with Image.open(path) as im:
        return im.height, im.width


def decode_gray_batch(paths: list[str], height: int, width: int,
                      num_threads: int = 8) -> np.ndarray:
    """Batch PNG→grayscale decode → float32 [n, H, W] in [0, 1].

    Fast path: the native C++ thread-pool decoder (native/png_batch.cpp,
    bit-identical to PIL's convert("L")). Rows it cannot handle (non-PNG
    such as .npy, unsupported encodings, mismatched dimensions) fall back to
    load_image_grayscale + bilinear resize.
    """
    from spectrogramgenai_tpu.data.native_png import load_png_batch_gray, native_available

    n = len(paths)
    out = np.zeros((n, height, width), np.float32)
    done = np.zeros(n, bool)
    png_rows = [i for i, p in enumerate(paths) if p.endswith(".png")]
    if png_rows and native_available():
        raw, ok = load_png_batch_gray([paths[i] for i in png_rows], height, width,
                                      num_threads=num_threads)
        for j, i in enumerate(png_rows):
            if ok[j]:
                out[i] = raw[j].astype(np.float32) / 255.0
                done[i] = True
    rest = [i for i in range(n) if not done[i]]

    def _fallback(i: int) -> None:
        img = load_image_grayscale(paths[i])
        if img.shape != (height, width):
            from PIL import Image

            img = np.asarray(
                Image.fromarray((img * 255).astype(np.uint8)).resize(
                    (width, height), Image.BILINEAR
                ),
                dtype=np.float32,
            ) / 255.0
        out[i] = img

    if len(rest) > 1 and num_threads > 1:
        # PIL decode releases the GIL — keep the fallback path (non-PNG
        # folders, no-toolchain hosts) as parallel as the native one
        with cf.ThreadPoolExecutor(max_workers=num_threads) as pool:
            list(pool.map(_fallback, rest))
    else:
        for i in rest:
            _fallback(i)
    return out


class _DecodedCache:
    """Bounded in-RAM cache of decoded images, keyed by dataset index.

    Multi-epoch training re-decodes the same PNGs every epoch — at the
    measured 415 img/s/core native decode rate that hard-caps classifier
    training (2-13k img/s steps) on decode-starved hosts. Each image is
    decoded once on first touch and served from RAM thereafter; if the
    full dataset would exceed ``budget_mb`` the cache disables itself
    with one warning (decode behavior is then exactly as before).
    """

    def _cache_init(self, enabled: bool, budget_mb: int):
        self._cache_enabled = enabled
        self._cache_budget = int(budget_mb) << 20
        self._cache_imgs: np.ndarray | None = None
        self._cache_have: np.ndarray | None = None

    def _cache_fetch(self, n: int, chunk: np.ndarray, h: int, w: int, decode_fn):
        """decode_fn(indices) -> (m, h, w) float32 for exactly those rows."""
        chunk = np.asarray(chunk)
        if not self._cache_enabled:
            return decode_fn(chunk)
        if self._cache_imgs is None or len(self._cache_have) < n:
            need = n * h * w * 4
            if need > self._cache_budget:
                import warnings

                warnings.warn(
                    f"decoded-image cache disabled: {n} images at {h}x{w} need "
                    f"{need >> 20} MB > budget {self._cache_budget >> 20} MB "
                    "(raise data.cache_budget_mb to re-enable)", stacklevel=2)
                self._cache_enabled = False
                return decode_fn(chunk)
            imgs = np.zeros((n, h, w), np.float32)
            have = np.zeros(n, bool)
            if self._cache_imgs is not None:  # dataset grew (synthetic inject)
                m = len(self._cache_have)
                imgs[:m], have[:m] = self._cache_imgs, self._cache_have
            self._cache_imgs, self._cache_have = imgs, have
        missing = np.unique(chunk[~self._cache_have[chunk]])
        if len(missing):
            self._cache_imgs[missing] = decode_fn(missing)
            self._cache_have[missing] = True
        return self._cache_imgs[chunk]


class ImageFolderSource(_DecodedCache):
    def __init__(self, root: str, bootstrap_balance: bool = False, seed: int = 0,
                 img_size: int | None = None, cache_decoded: bool = False,
                 cache_budget_mb: int = 8192):
        self.paths, self.labels, self.classes = scan_image_folder(root)
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")
        self.labels = np.asarray(self.labels)
        self.bootstrap_balance = bootstrap_balance
        self.rng = np.random.default_rng(seed)
        self.img_size = img_size
        self._probed_hw: tuple[int, int] | None = None
        self._cache_init(cache_decoded, cache_budget_mb)

    def epoch_indices(self) -> np.ndarray:
        if self.bootstrap_balance:
            idx = bootstrap_balance_indices(self.labels, self.rng)
        else:
            idx = np.arange(len(self.paths))
        self.rng.shuffle(idx)
        return idx

    def load(self, i: int):
        img = load_image_grayscale(self.paths[i])
        if self.img_size and img.shape != (self.img_size, self.img_size):
            from PIL import Image

            img = np.asarray(
                Image.fromarray((img * 255).astype(np.uint8)).resize(
                    (self.img_size, self.img_size), Image.BILINEAR
                ),
                dtype=np.float32,
            ) / 255.0
        return {"image": img[..., None], "label": np.int32(self.labels[i])}

    def _target_hw(self) -> tuple[int, int]:
        if self.img_size:
            return self.img_size, self.img_size
        if self._probed_hw is None:
            self._probed_hw = _probe_hw(self.paths[0])
        return self._probed_hw

    def load_batch(self, chunk: np.ndarray, num_threads: int = 8) -> dict:
        """Whole-batch decode through the native PNG path (one C++ call),
        optionally served from the decoded-image RAM cache."""
        h, w = self._target_hw()
        imgs = self._cache_fetch(
            len(self.paths), chunk, h, w,
            lambda idx: decode_gray_batch([self.paths[i] for i in idx], h, w,
                                          num_threads=num_threads))
        return {"image": imgs[..., None], "label": self.labels[chunk].astype(np.int32)}


class DataFrameImageSource(_DecodedCache):
    def __init__(self, df, root_dir: str, class_names: list[str],
                 indices_columns: list[str] | None = None, seed: int = 0,
                 cache_decoded: bool = False, cache_budget_mb: int = 8192):
        self.df = df.reset_index(drop=True)
        self.root_dir = root_dir
        self.class_names = list(class_names)
        self.indices_columns = indices_columns
        self.rng = np.random.default_rng(seed)
        self._probed_hw: tuple[int, int] | None = None
        self._cache_init(cache_decoded, cache_budget_mb)

    def epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.df))
        self.rng.shuffle(idx)
        return idx

    def _path(self, row) -> str:
        path = row["file_name"]
        if not os.path.exists(path):
            path = os.path.join(self.root_dir, spec_png_name(row["file_name"], row["begin_time"]))
        return path

    def _extras(self, row, out: dict) -> dict:
        if "embeddings" in row and isinstance(row["embeddings"], str):
            out["embedding"] = np.asarray([float(v) for v in row["embeddings"].split(",")], np.float32)
        if self.indices_columns:
            out["a_ind"] = np.asarray([float(row[c]) for c in self.indices_columns], np.float32)
        return out

    def load(self, i: int):
        row = self.df.iloc[i]
        img = load_image_grayscale(self._path(row))
        out = {
            "image": img[..., None].astype(np.float32),
            "label": np.int32(self.class_names.index(row["common_name"])),
        }
        return self._extras(row, out)

    def load_batch(self, chunk: np.ndarray, num_threads: int = 8) -> dict:
        """Whole-batch decode through the native PNG path (one C++ call),
        optionally served from the decoded-image RAM cache."""
        rows = [self.df.iloc[int(i)] for i in chunk]
        if self._probed_hw is None:
            self._probed_hw = _probe_hw(self._path(rows[0]))
        h, w = self._probed_hw
        imgs = self._cache_fetch(
            len(self.df), chunk, h, w,
            lambda idx: decode_gray_batch(
                [self._path(self.df.iloc[int(i)]) for i in idx], h, w,
                num_threads=num_threads))
        samples = []
        for j, r in enumerate(rows):
            out = {"image": imgs[j][..., None],
                   "label": np.int32(self.class_names.index(r["common_name"]))}
            samples.append(self._extras(r, out))
        return _collate(samples)


def _collate(samples: list[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def iterate_batches(source, batch_size: int, *, drop_remainder: bool = True,
                    num_threads: int = 8, epochs: int | None = 1,
                    skip_batches: int = 0,
                    process_shard: bool | None = None) -> Iterator[dict]:
    """Decode-threaded batch iterator over `source` (host NumPy batches).

    Sources exposing ``load_batch(chunk, num_threads=8)`` (whole-batch
    native decode, one C++ thread-pooled call per batch) take that path;
    otherwise per-sample ``load`` fans out over a Python thread pool.

    ``skip_batches`` enables exact mid-epoch resume: the first N batches of
    the stream are skipped WITHOUT decoding, but ``source.epoch_indices()``
    is still consumed batch-for-batch, so a restarted process (same source
    seed) sees the identical remaining stream the original run would have —
    the train step counter in a checkpoint is the full resume position.

    ``process_shard`` (default: auto — on iff ``jax.process_count() > 1``)
    is the multi-host input sharding: ``batch_size`` stays the GLOBAL batch,
    every process draws the same index permutation (sources must be built
    with the same seed on every host), and each process decodes only its own
    contiguous rows of each global batch — the rows its addressable devices
    hold under ``core.mesh.shard_batch``'s
    jax.make_array_from_process_local_data assembly. skip_batches still
    counts global batches, so mid-epoch resume composes with multi-host.
    """
    if process_shard is None:
        import jax

        process_shard = jax.process_count() > 1
    load_batch = getattr(source, "load_batch", None)
    pool = cf.ThreadPoolExecutor(max_workers=num_threads)
    try:
        epoch = 0
        to_skip = skip_batches
        while epochs is None or epoch < epochs:
            idx = source.epoch_indices()
            usable = len(idx) - (len(idx) % batch_size) if drop_remainder else len(idx)
            for start in range(0, usable, batch_size):
                if to_skip > 0:
                    to_skip -= 1
                    continue
                chunk = idx[start : start + batch_size]
                if process_shard:
                    from spectrogramgenai_tpu.core.mesh import process_local_slice

                    chunk = chunk[process_local_slice(len(chunk))]
                if load_batch is not None:
                    yield load_batch(chunk, num_threads=num_threads)
                else:
                    yield _collate(list(pool.map(source.load, chunk)))
            epoch += 1
    finally:
        pool.shutdown(wait=False)


def device_prefetch(batch_iter: Iterator[dict], mesh, depth: int = 2) -> Iterator[dict]:
    """Overlap host decode + H2D with device compute (double buffering)."""
    from spectrogramgenai_tpu.core.mesh import shard_batch

    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for batch in batch_iter:
                q.put(shard_batch(mesh, batch))
            q.put(sentinel)
        except BaseException as e:  # surface errors in the consumer, never swallow
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def padded_eval_batches(source, batch_size: int, mesh):
    """Evaluation batches: keep the remainder, zero-pad each batch up to a
    multiple of the mesh's data-axis size, and yield (sharded_batch, n_true).

    Eval sets are rarely divisible by the device count; training can drop the
    remainder but evaluation must not (the reference evaluates every sample).

    Multi-host: every process decodes the full global batch here (remainder
    batches can't split evenly across processes before padding), pads it to a
    multiple of the data axis, then hands shard_batch only its local rows;
    ``n`` stays the GLOBAL true count on every host.
    """
    import jax

    from spectrogramgenai_tpu.core.mesh import DATA_AXIS, process_local_slice, shard_batch

    data_size = mesh.shape[DATA_AXIS]
    multiproc = jax.process_count() > 1
    for batch in iterate_batches(source, batch_size, epochs=1, drop_remainder=False,
                                 process_shard=False):
        n = len(next(iter(batch.values())))
        pad = (-n) % data_size
        if pad:
            batch = {k: np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)])
                     for k, v in batch.items()}
        if multiproc:
            sl = process_local_slice(n + pad)
            batch = {k: v[sl] for k, v in batch.items()}
        yield shard_batch(mesh, batch), n


def synthetic_mix_dataframe(real_df, gen_dir: str, class_names: list[str],
                            per_class: int, cap: int = 250, seed: int = 0):
    """Real+synthetic training mix (helpers.py:602-669): sample `per_class`
    generated images per class (without replacement, only generation indices
    < cap) from `{class}_gen_imgs_{i}_{samp}.png` files, and append them to
    the real dataframe with file_name = full path."""
    import pandas as pd
    import re

    rng = np.random.default_rng(seed)
    rows = []
    if per_class > 0 and os.path.isdir(gen_dir):
        files = os.listdir(gen_dir)
        pattern = re.compile(r"^(.+)_gen_imgs_(\d+)_(\d+)\.png$")
        by_class: dict[str, list[str]] = {c: [] for c in class_names}
        for f in files:
            m = pattern.match(f)
            if m and m.group(1) in by_class and int(m.group(3)) < cap:
                by_class[m.group(1)].append(f)
        for cname, flist in by_class.items():
            take = min(per_class, len(flist))
            chosen = rng.choice(np.asarray(flist), size=take, replace=False)
            for f in chosen:
                rows.append({"file_name": os.path.join(gen_dir, f), "begin_time": 0,
                             "common_name": cname})
    gen_df = pd.DataFrame(rows)
    if len(gen_df) == 0:
        return real_df
    return pd.concat([real_df, gen_df], ignore_index=True)
