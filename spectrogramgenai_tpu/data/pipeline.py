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


class ImageFolderSource:
    def __init__(self, root: str, bootstrap_balance: bool = False, seed: int = 0,
                 img_size: int | None = None):
        self.paths, self.labels, self.classes = scan_image_folder(root)
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")
        self.labels = np.asarray(self.labels)
        self.bootstrap_balance = bootstrap_balance
        self.rng = np.random.default_rng(seed)
        self.img_size = img_size

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


class DataFrameImageSource:
    def __init__(self, df, root_dir: str, class_names: list[str],
                 indices_columns: list[str] | None = None, seed: int = 0):
        self.df = df.reset_index(drop=True)
        self.root_dir = root_dir
        self.class_names = list(class_names)
        self.indices_columns = indices_columns
        self.rng = np.random.default_rng(seed)

    def epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.df))
        self.rng.shuffle(idx)
        return idx

    def load(self, i: int):
        row = self.df.iloc[i]
        path = row["file_name"]
        if not os.path.exists(path):
            path = os.path.join(self.root_dir, spec_png_name(row["file_name"], row["begin_time"]))
        img = load_image_grayscale(path)
        out = {
            "image": img[..., None].astype(np.float32),
            "label": np.int32(self.class_names.index(row["common_name"])),
        }
        if "embeddings" in row and isinstance(row["embeddings"], str):
            out["embedding"] = np.asarray([float(v) for v in row["embeddings"].split(",")], np.float32)
        if self.indices_columns:
            out["a_ind"] = np.asarray([float(row[c]) for c in self.indices_columns], np.float32)
        return out


def _collate(samples: list[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def iterate_batches(source, batch_size: int, *, drop_remainder: bool = True,
                    num_threads: int = 8, epochs: int | None = 1) -> Iterator[dict]:
    """Decode-threaded batch iterator over `source` (host NumPy batches)."""
    pool = cf.ThreadPoolExecutor(max_workers=num_threads)
    try:
        epoch = 0
        while epochs is None or epoch < epochs:
            idx = source.epoch_indices()
            usable = len(idx) - (len(idx) % batch_size) if drop_remainder else len(idx)
            for start in range(0, usable, batch_size):
                chunk = idx[start : start + batch_size]
                samples = list(pool.map(source.load, chunk))
                yield _collate(samples)
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
    """
    from spectrogramgenai_tpu.core.mesh import DATA_AXIS, shard_batch

    data_size = mesh.shape[DATA_AXIS]
    for batch in iterate_batches(source, batch_size, epochs=1, drop_remainder=False):
        n = len(next(iter(batch.values())))
        pad = (-n) % data_size
        if pad:
            batch = {k: np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)])
                     for k, v in batch.items()}
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
