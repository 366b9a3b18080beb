"""Synthesize the miniature experiment corpus for docs/EXPERIMENT.md.

The reference's deliverable is a science loop (reference
train_classifiers.py:9-83 + postprocessing/analyse_results.R): does adding
DDPM-generated synthetic spectrograms to classifier training improve accuracy
under wind-farm noise?  This tool builds a self-contained analog of the
reference's corpus (640 h of real recordings, README.md:13) that the whole
CLI chain can run on in minutes: 27 synthetic "species", each a parametric
bird-call generator (carrier frequency, sweep/trill modulation, syllable
rhythm, harmonic stack) mixed over wind-farm-style noise (1/f rumble + gust
envelope + periodic turbine swish) at randomized SNR.

Class separation is real but not trivial: per-sample jitter on pitch, timing
and syllable count, and val/test SNR is drawn lower (noisier) than train —
the same structure that makes the reference's augmentation question
interesting.

Usage:
  python tools/make_experiment_dataset.py --out exp_data \
      --classes 27 --train_per_class 10 --val_per_class 6 --test_per_class 6

Writes:
  exp_data/wavs/*.wav
  exp_data/manifest_{train,val,test}.csv   (file_name, begin_time, end_time, common_name)

After gen_specs renders the PNGs, `--arrange` sorts a flat PNG folder into
the datasets/{split}/{class}/ ImageFolder tree the trainers consume.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

CLIP_S = 7.0  # gen_specs slices a 6 s window; give it margin


def _species_params(ci: int, rng: np.random.Generator) -> dict:
    """Deterministic per-class call signature (keyed by class index only)."""
    r = np.random.default_rng(1000 + ci)
    return {
        # log-spaced carriers across the band, shuffled so neighbors differ
        "f0": float(900.0 * (9000.0 / 900.0) ** (((ci * 11) % 27) / 26.0)),
        "kind": ("upsweep", "downsweep", "trill", "tone")[ci % 4],
        "sweep_oct": float(r.uniform(0.3, 1.0)),       # sweep span in octaves
        "trill_hz": float(r.uniform(8.0, 25.0)),       # FM rate for trills
        "trill_depth": float(r.uniform(0.05, 0.25)),   # FM depth (fraction of f0)
        "syllable_s": float(r.uniform(0.08, 0.35)),
        "gap_s": float(r.uniform(0.05, 0.3)),
        "n_syll": int(r.integers(3, 9)),
        "harmonics": [1.0] + [float(a) for a in r.uniform(0.05, 0.5, size=2)],
    }


def _call(params: dict, sr: int, rng: np.random.Generator) -> np.ndarray:
    """One vocalization bout with per-sample jitter."""
    n = int(CLIP_S * sr)
    out = np.zeros(n, np.float32)
    f0 = params["f0"] * rng.uniform(0.95, 1.05)
    n_syll = max(2, params["n_syll"] + int(rng.integers(-1, 2)))
    t0 = rng.uniform(0.2, 1.0)
    for _ in range(n_syll):
        dur = params["syllable_s"] * rng.uniform(0.8, 1.2)
        m = int(dur * sr)
        if m < 8:
            continue
        t = np.arange(m) / sr
        kind = params["kind"]
        if kind == "upsweep":
            freq = f0 * 2.0 ** (params["sweep_oct"] * t / dur)
        elif kind == "downsweep":
            freq = f0 * 2.0 ** (-params["sweep_oct"] * t / dur)
        elif kind == "trill":
            freq = f0 * (1.0 + params["trill_depth"] * np.sin(2 * np.pi * params["trill_hz"] * t))
        else:  # tone
            freq = np.full(m, f0)
        phase = 2 * np.pi * np.cumsum(freq) / sr
        env = np.hanning(m).astype(np.float32)
        syll = np.zeros(m, np.float32)
        for h, amp in enumerate(params["harmonics"], start=1):
            syll += amp * np.sin(h * phase).astype(np.float32)
        syll *= env * rng.uniform(0.6, 1.0)
        start = int(t0 * sr)
        if start + m > n:
            break
        out[start : start + m] += syll
        t0 += dur + params["gap_s"] * rng.uniform(0.7, 1.4)
    return out


def _wind_noise(n: int, sr: int, rng: np.random.Generator) -> np.ndarray:
    """Wind-farm-style background: 1/f-shaped noise + slow gust envelope +
    ~1 Hz periodic turbine swish (amplitude modulation)."""
    white = rng.standard_normal(n).astype(np.float32)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(n, 1.0 / sr)
    shape = 1.0 / np.maximum(f, 20.0) ** 0.8  # pink-ish with low-freq emphasis
    noise = np.fft.irfft(spec * shape, n).astype(np.float32)
    t = np.arange(n) / sr
    gust = 1.0 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.05, 0.2) * t + rng.uniform(0, 6.3))
    swish = 1.0 + 0.3 * np.maximum(0, np.sin(2 * np.pi * rng.uniform(0.8, 1.3) * t)) ** 2
    noise *= (gust * swish).astype(np.float32)
    return noise / (np.std(noise) + 1e-9)


def synth_clip(ci: int, sr: int, snr_db: float, rng: np.random.Generator) -> np.ndarray:
    sig = _call(_species_params(ci, rng), sr, rng)
    noise = _wind_noise(len(sig), sr, rng)
    p_sig = float(np.mean(sig**2)) + 1e-12
    p_noise = float(np.mean(noise**2)) + 1e-12
    noise *= np.sqrt(p_sig / p_noise / 10.0 ** (snr_db / 10.0))
    mix = sig + noise
    return (mix / (np.max(np.abs(mix)) + 1e-9) * 0.8).astype(np.float32)


def make(out: str, classes: int, per_split: dict[str, int], sr: int, seed: int,
         snr_override: dict[str, tuple[float, float]] | None = None,
         only: list[str] | None = None):
    from scipy.io import wavfile

    wav_dir = os.path.join(out, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    # train is cleaner than val/test: the reference's question is robustness
    # under noise, so held-out sets are harder. A 27-way CNN saturates at
    # val_acc 1.0 on the (0,12) dB default with 10 train/class — pass e.g.
    # --val_snr=-12,2 for a hard held-out set that leaves headroom for the
    # synthetic-augmentation sweep to move.
    snr_range = {"train": (3.0, 18.0), "val": (0.0, 12.0), "test": (0.0, 12.0)}
    snr_range.update(snr_override or {})
    for split, count in per_split.items():
        if only and split not in only:
            continue
        rng = np.random.default_rng(seed + {"train": 0, "val": 1, "test": 2}[split])
        rows = []
        for ci in range(classes):
            cname = f"species{ci:02d}"
            for i in range(count):
                snr = rng.uniform(*snr_range[split])
                wav = synth_clip(ci, sr, snr, rng)
                name = f"{cname}_{split}_{i:03d}.wav"
                wavfile.write(os.path.join(wav_dir, name), sr,
                              (wav * 32000).astype(np.int16))
                rows.append({"file_name": name, "begin_time": 0, "end_time": int(CLIP_S),
                             "common_name": cname})
        pd.DataFrame(rows).to_csv(os.path.join(out, f"manifest_{split}.csv"), index=False)
        print(f"{split}: {classes * count} wavs")


def arrange(out: str, png_dir: str, datasets_dir: str):
    """Flat gen_specs output → datasets/{split}/{class}/ ImageFolder tree."""
    import shutil

    for split in ("train", "val", "test"):
        man = os.path.join(out, f"manifest_{split}.csv")
        if not os.path.exists(man):
            continue
        df = pd.read_csv(man)
        n = 0
        for _, row in df.iterrows():
            png = f"{row['file_name']}_0_0.png"
            src = os.path.join(png_dir, png)
            if not os.path.exists(src):
                print(f"missing: {png}")
                continue
            d = os.path.join(datasets_dir, split, row["common_name"])
            os.makedirs(d, exist_ok=True)
            shutil.copy(src, os.path.join(d, png))
            n += 1
        print(f"{split}: arranged {n} images")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--classes", type=int, default=27)
    p.add_argument("--train_per_class", type=int, default=10)
    p.add_argument("--val_per_class", type=int, default=6)
    p.add_argument("--test_per_class", type=int, default=6)
    p.add_argument("--sr", type=int, default=22050)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--only", default=None,
                   help="comma list of splits to (re)synthesize, e.g. 'val,test'")
    for s in ("train", "val", "test"):
        p.add_argument(f"--{s}_snr", default=None, metavar="LO,HI",
                       help=f"override the {s} SNR range in dB")
    p.add_argument("--arrange", default=None, metavar="PNG_DIR",
                   help="arrange a flat gen_specs PNG folder into --datasets_dir")
    p.add_argument("--datasets_dir", default=None)
    a = p.parse_args(argv)
    if a.arrange:
        arrange(a.out, a.arrange, a.datasets_dir or os.path.join(a.out, "datasets"))
    else:
        override = {}
        for s in ("train", "val", "test"):
            v = getattr(a, f"{s}_snr")
            if v:
                lo, hi = (float(x) for x in v.split(","))
                override[s] = (lo, hi)
        make(a.out, a.classes,
             {"train": a.train_per_class, "val": a.val_per_class, "test": a.test_per_class},
             a.sr, a.seed, snr_override=override,
             only=a.only.split(",") if a.only else None)


if __name__ == "__main__":
    main()
