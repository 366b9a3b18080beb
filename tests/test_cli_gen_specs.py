"""End-to-end gen_specs CLI: synthetic wavs + manifest → PNG spectrograms."""

import os

import numpy as np
import pandas as pd
from scipy.io import wavfile


def test_gen_specs_end_to_end(tmp_path):
    from spectrogramgenai_tpu.cli.gen_specs import run

    sr = 22050
    wav_dir = str(tmp_path / "wavs")
    out_dir = str(tmp_path / "images")
    os.makedirs(wav_dir)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        t = np.arange(sr * 8) / sr
        wav = np.sin(2 * np.pi * (500 + 200 * i) * t) + 0.05 * rng.standard_normal(len(t))
        name = f"rec{i}.wav"
        wavfile.write(os.path.join(wav_dir, name), sr, (wav * 16000).astype(np.int16))
        rows.append({"file_name": name, "begin_time": 1, "end_time": 8, "common_name": f"bird{i}"})
    manifest = str(tmp_path / "manifest.csv")
    pd.DataFrame(rows).to_csv(manifest, index=False)

    n = run(manifest, wav_dir, out_dir, batch_size=2, skip_existing=True, save_npy=True)
    assert n == 3
    files = sorted(os.listdir(out_dir))
    assert "rec0.wav_1_1.png" in files and "rec0.wav_1_1.npy" in files

    # spectrogram correctness through the whole CLI path
    from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig, reference_logmel_np
    from spectrogramgenai_tpu.audio.wavio import load_wav, slice_clip

    wav, _ = load_wav(os.path.join(wav_dir, "rec0.wav"))
    clip = slice_clip(wav, sr, 1, 8)
    want = reference_logmel_np(clip, SpectrogramConfig(sample_rate=sr))
    got = np.load(os.path.join(out_dir, "rec0.wav_1_1.npy"))
    np.testing.assert_allclose(got, want, atol=5e-3)

    # skip_existing: second run writes nothing new
    n2 = run(manifest, wav_dir, out_dir, batch_size=2, skip_existing=True)
    assert n2 == 0
