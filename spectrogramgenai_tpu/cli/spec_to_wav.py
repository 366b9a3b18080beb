"""Spectrogram → audio reconstruction (mel NNLS inverse + Griffin-Lim).

Capability the reference lacks: its FAD metric scores *audio* directories
(reference src/fad.py:11-24) but generation emits spectrogram PNGs
(src/diff_modules.py:771-775) — there is no path from generated samples to
a FAD-scorable folder. This CLI inverts a folder of spectrograms (viridis
PNGs via the exact colormap inverse, or .npy dB arrays) back to WAV,
batched through one jitted on-device program.

  python -m spectrogramgenai_tpu.cli.spec_to_wav --in_dir gen_images \
      --out_dir gen_audio [--gl_iters 32] [--out_sr 48000]

Then e.g.:  python -m spectrogramgenai_tpu.cli.fad --background_dir real_audio \
      --eval_dir gen_audio --mode clap --clap_ckpt models/eval/clap.msgpack
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def run(in_dir: str, out_dir: str, batch_size: int = 32, gl_iters: int = 32,
        nnls_iters: int = 32, sample_rate: int = 22050, top_db: float = 80.0,
        out_sr: int | None = None, random_phase: bool = False,
        limit: int | None = None, n_fft: int = 2048, hop_length: int = 384) -> int:
    import jax

    from spectrogramgenai_tpu.audio.invert import db_mel_to_audio, png_unit_to_db, resample_wavs
    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig
    from spectrogramgenai_tpu.audio.wavio import save_wav

    names = sorted(f for f in os.listdir(in_dir) if f.endswith((".png", ".npy")))
    if limit:
        names = names[:limit]
    if not names:
        raise SystemExit(f"no .png/.npy spectrograms in {in_dir}")
    os.makedirs(out_dir, exist_ok=True)

    def load_db(path: str) -> np.ndarray:
        if path.endswith(".npy"):
            return np.load(path).astype(np.float32)  # exact dB values
        from spectrogramgenai_tpu.audio.export import load_generated_spec_uint8

        # Exact viridis inverse — convert("L") luminance warps values up to
        # ~13 dB non-monotonically (see export.load_generated_spec_uint8),
        # which made this path diverge from `generate --audio_dir` on the
        # same samples. Rows are mel bins (export writes spec[mel, time]).
        img01 = load_generated_spec_uint8(path).astype(np.float32) / 255.0
        return np.asarray(png_unit_to_db(img01, top_db=top_db))

    first = load_db(os.path.join(in_dir, names[0]))
    n_mels, n_frames = first.shape
    cfg = SpectrogramConfig(sample_rate=sample_rate, n_fft=n_fft, hop_length=hop_length,
                            n_mels=n_mels, num_frames=n_frames)
    key = jax.random.PRNGKey(0) if random_phase else None

    t0 = time.perf_counter()
    written = 0
    for lo in range(0, len(names), batch_size):
        chunk = names[lo : lo + batch_size]
        db = np.stack([load_db(os.path.join(in_dir, f)) for f in chunk])
        n_true = len(chunk)
        if n_true < batch_size:  # pad the tail so the jitted shape is stable
            db = np.concatenate([db, np.zeros((batch_size - n_true, *db.shape[1:]), db.dtype)])
        wavs = np.asarray(db_mel_to_audio(db, cfg, gl_iters=gl_iters,
                                          nnls_iters=nnls_iters, key=key))
        wavs, sr = resample_wavs(wavs[: len(chunk)], sample_rate, out_sr)
        for wav, fname in zip(wavs, chunk):
            stem = os.path.splitext(fname)[0]
            save_wav(os.path.join(out_dir, stem + ".wav"), wav, sr)
            written += 1
    dt = time.perf_counter() - t0
    print(f"spec_to_wav: {written} wavs → {out_dir} in {dt:.1f}s "
          f"({written / max(dt, 1e-9):.1f} clips/s, gl_iters={gl_iters})")
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in_dir", required=True, help="folder of spectrogram .png/.npy")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--gl_iters", type=int, default=32)
    p.add_argument("--nnls_iters", type=int, default=32)
    p.add_argument("--sample_rate", type=int, default=22050,
                   help="sample rate the spectrograms were computed at")
    p.add_argument("--n_fft", type=int, default=2048)
    p.add_argument("--hop_length", type=int, default=384)
    p.add_argument("--top_db", type=float, default=80.0,
                   help="dynamic range assumed for PNG inputs (power_to_db clamp)")
    p.add_argument("--out_sr", type=int, default=None,
                   help="resample output wavs (e.g. 48000 for CLAP FAD)")
    p.add_argument("--random_phase", action="store_true",
                   help="random Griffin-Lim phase init instead of deterministic ones")
    p.add_argument("--limit", type=int, default=None)
    a = p.parse_args(argv)
    from spectrogramgenai_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    run(a.in_dir, a.out_dir, batch_size=a.batch_size, gl_iters=a.gl_iters,
        nnls_iters=a.nnls_iters, sample_rate=a.sample_rate, top_db=a.top_db,
        out_sr=a.out_sr, random_phase=a.random_phase, limit=a.limit,
        n_fft=a.n_fft, hop_length=a.hop_length)


if __name__ == "__main__":
    main()
