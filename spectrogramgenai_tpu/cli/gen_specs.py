"""Bulk wav → 256×256 log-mel spectrogram export.

Rebuild of reference gen_specs.py / birdnet_all_spec.py (the working
variant): reads a manifest of (file_name, begin_time, end_time, common_name)
rows, slices 6-s windows, runs the batched TPU mel pipeline (fused Pallas on
TPU, jnp elsewhere), and writes viridis PNGs named
``{file}_{begin}_{begin}.png`` (plus optional exact .npy arrays).

Usage:
  python -m spectrogramgenai_tpu.cli.gen_specs --manifest specdata.csv \
      --wav_dir Birdnet_conf_files --out_dir images [--skip_existing 1]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import pandas as pd


def run(manifest: str, wav_dir: str, out_dir: str, batch_size: int = 64,
        skip_existing: bool = True, save_npy: bool = False, limit: int | None = None,
        exact: bool = True):
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.export import (
        save_spectrogram_npy,
        save_spectrogram_pngs,
        spec_png_name,
    )
    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig, logmel_spectrogram
    from spectrogramgenai_tpu.ops.mel_kernel import fused_logmel

    if manifest.endswith(".npz"):
        data = np.load(manifest, allow_pickle=True)
        df = pd.DataFrame(data["train_df"])
    else:
        df = pd.read_csv(manifest)
    if limit:
        df = df.iloc[:limit]

    os.makedirs(out_dir, exist_ok=True)
    on_tpu = jax.default_backend() == "tpu"

    # Group rows by sample rate so each device batch is uniform.
    pending: dict[int, list] = {}
    n_done = 0
    t0 = time.time()

    def flush(sr: int):
        nonlocal n_done
        rows = pending.pop(sr, [])
        if not rows:
            return
        cfg = SpectrogramConfig(sample_rate=sr)
        clips = np.stack([c for _, c in rows])
        if on_tpu:
            specs = np.asarray(fused_logmel(jnp.asarray(clips), cfg, exact=exact))
        else:
            specs = np.asarray(logmel_spectrogram(jnp.asarray(clips), cfg))
        names = [spec_png_name(row["file_name"], row["begin_time"]) for row, _ in rows]
        # batch write through the native thread-pool PNG encoder — the
        # single-threaded PIL encode, not the mel math, was the export wall
        save_spectrogram_pngs(specs, [os.path.join(out_dir, n) for n in names])
        if save_npy:
            for name, spec in zip(names, specs):
                save_spectrogram_npy(spec, os.path.join(out_dir, name.replace(".png", ".npy")))
        n_done += len(rows)

    # Native C++ thread-pool decode (falls back to scipy inside load_wav_batch).
    from spectrogramgenai_tpu.data.native_wav import load_wav_batch

    rows, wav_paths = [], []
    for _, row in df.iterrows():
        name = spec_png_name(row["file_name"], row["begin_time"])
        if skip_existing and os.path.exists(os.path.join(out_dir, name)):
            continue  # birdnet_all_spec.py:41-42 semantics
        wav_path = os.path.join(wav_dir, row["file_name"])
        if os.path.exists(wav_path):
            rows.append(row)
            wav_paths.append(wav_path)

    for start in range(0, len(rows), batch_size * 4):
        chunk_rows = rows[start : start + batch_size * 4]
        chunk_paths = wav_paths[start : start + batch_size * 4]
        begins = [float(int(r["begin_time"])) for r in chunk_rows]
        ends = [float(int(r["end_time"])) for r in chunk_rows]
        max_clip = int(6.0 * 48000)  # buffer wide enough for any common sr
        clips, rates = load_wav_batch(chunk_paths, begins, ends, 6.0, max_clip)
        for row, clip, sr in zip(chunk_rows, clips, rates):
            if sr <= 0:
                continue
            n = int(6.0 * sr)
            pending.setdefault(int(sr), []).append((row, clip[:n]))
            if len(pending[int(sr)]) >= batch_size:
                flush(int(sr))
    for sr in list(pending):
        flush(sr)

    dt = time.time() - t0
    print(f"wrote {n_done} spectrograms to {out_dir} in {dt:.1f}s "
          f"({n_done / max(dt, 1e-9):.1f} specs/sec)")
    return n_done


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True)
    p.add_argument("--wav_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--skip_existing", type=int, default=1)
    p.add_argument("--save_npy", type=int, default=0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--exact", default="1", choices=["0", "1", "high"],
                   help="1 = bit-parity mel math (default); high = 3-pass MXU matmuls "
                        "(near-exact, faster); 0 = 1-pass bf16, fastest "
                        "(<~2.5 dB error at the quietest bins). "
                        "Measured trade-offs: PARITY.md / tools/mel_precision_bench.py")
    a = p.parse_args(argv)
    exact = {"0": False, "1": True, "high": "high"}[a.exact]
    run(a.manifest, a.wav_dir, a.out_dir, a.batch_size, bool(a.skip_existing), bool(a.save_npy), a.limit,
        exact=exact)


if __name__ == "__main__":
    main()
