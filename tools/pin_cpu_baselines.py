"""Re-measure and pin the CPU reference baselines used by bench.py.

Run on an IDLE host (this VM has one core — any concurrent load slows the
CPU reference and inflates the x-CPU ratios; see CLAUDE.md). The pin policy
is "fastest ever measured": the new measurement only replaces a pinned value
when it is FASTER, so the pinned baseline is always the hardest one — every
speedup bench.py reports against it is conservative.

Writes tools/cpu_baselines.json (consumed by bench.py).

Usage:  JAX_PLATFORMS=cpu python tools/pin_cpu_baselines.py [--force]
        --force: overwrite with the fresh measurement even if slower.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
PIN_PATH = os.path.join(HERE, "cpu_baselines.json")


def measure_mel(n: int = 12) -> float:
    """Best-of-N single-clip reference mel throughput (specs/sec)."""
    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig, reference_logmel_np

    cfg = SpectrogramConfig(sample_rate=22050)
    rng = np.random.default_rng(0)
    t = np.arange(cfg.clip_samples) / cfg.sample_rate
    audio = np.stack(
        [np.sin(2 * np.pi * (800 + 37 * k) * t) * np.exp(-0.3 * t) for k in range(8)]
    ).astype(np.float32)
    audio += 0.05 * rng.standard_normal(audio.shape).astype(np.float32)
    reference_logmel_np(audio[0], cfg)  # warm (filterbank cache, pocketfft plans)
    per = []
    for i in range(n):
        t0 = time.perf_counter()
        reference_logmel_np(audio[i % 8], cfg)
        per.append(time.perf_counter() - t0)
    return 1.0 / min(per)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true",
                    help="overwrite pins with the fresh measurement even if slower")
    args = ap.parse_args()

    with open(PIN_PATH) as f:
        pins = json.load(f)

    today = datetime.date.today().isoformat()
    fresh_key = f"fresh_idle_{today.replace('-', '_')}"

    mel_sps = measure_mel()
    pins["mel"][fresh_key] = round(mel_sps, 2)
    if args.force or mel_sps > pins["mel"]["specs_per_sec"]:
        pins["mel"]["specs_per_sec"] = round(mel_sps, 2)
        pins["mel"]["provenance"] = (
            f"idle re-measure {today}; single-clip reference_logmel_np "
            "(librosa-parity NumPy math), best-of-12 timing; tools/pin_cpu_baselines.py")
    print(f"mel: fresh {mel_sps:.2f} specs/s, pinned {pins['mel']['specs_per_sec']}")

    from tools.cpu_baseline_torch import measure_sampling_baseline

    r = measure_sampling_baseline(batch=27)
    pins["ddpm"][fresh_key] = r["samples_per_sec"]
    if args.force or r["samples_per_sec"] > pins["ddpm"]["samples_per_sec"]:
        pins["ddpm"].update(
            samples_per_sec=r["samples_per_sec"],
            chain_seconds_batch27=r["chain_seconds"],
            step_seconds_batch27=round(r["step_seconds"], 2),
            torch_threads=r["torch_threads"],
            provenance=(f"idle re-measure {today}; tools/cpu_baseline_torch.py "
                        "measure_sampling_baseline(batch=27)"),
        )
    print(f"ddpm: fresh {r['samples_per_sec']:.6g} samples/s, "
          f"pinned {pins['ddpm']['samples_per_sec']:.6g}")

    pins["recorded"] = today
    with open(PIN_PATH, "w") as f:
        json.dump(pins, f, indent=2)
        f.write("\n")
    print(f"wrote {PIN_PATH}")


if __name__ == "__main__":
    main()
