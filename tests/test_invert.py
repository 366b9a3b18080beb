"""Spectrogram→audio inversion (audio/invert.py, cli/spec_to_wav.py).

Capability the reference lacks entirely (its FAD scores audio dirs,
reference src/fad.py:11-24, but generation emits PNGs) — so these tests pin
self-consistency: ISTFT inverts the forward STFT, NNLS inverts the mel
projection, and the full chain reproduces the input's log-mel spectrogram.
"""

import numpy as np

from spectrogramgenai_tpu.audio.spectrogram import SpectrogramConfig, logmel_spectrogram

CFG = SpectrogramConfig(sample_rate=8000, n_fft=512, hop_length=128, n_mels=64,
                        num_frames=60, clip_seconds=1.0)


def _tone_batch():
    rng = np.random.default_rng(0)
    t = np.arange(CFG.sample_rate) / CFG.sample_rate
    x = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 950 * t)
         + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    return np.stack([x, x[::-1]])


def test_istft_inverts_stft():
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.invert import istft, stft_complex

    xb = _tone_batch()
    back = np.asarray(istft(stft_complex(jnp.asarray(xb), CFG), CFG, length=xb.shape[1]))
    # interior exact; the first/last half-window lack full overlap coverage
    edge = CFG.n_fft // 2
    np.testing.assert_allclose(back[:, edge:-edge], xb[:, edge:-edge], atol=1e-5)


def test_mel_nnls_inverse_reprojects():
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.invert import mel_power_to_stft_power
    from spectrogramgenai_tpu.audio.spectrogram import _constants, stft_power

    xb = _tone_batch()
    power = np.asarray(stft_power(jnp.asarray(xb), CFG))  # (B, T, F)
    _, fb = _constants(CFG)
    mel = np.einsum("mf,btf->bmt", fb, power)

    inv = np.asarray(mel_power_to_stft_power(jnp.asarray(mel), CFG, n_iter=48))
    assert inv.shape == power.shape
    assert (inv >= 0).all()
    remel = np.einsum("mf,btf->bmt", fb, inv)
    # the NNLS solution must reproject onto the observed mel energies
    rel = np.abs(remel - mel).sum() / mel.sum()
    assert rel < 0.005, rel  # FISTA @ 48 iters measures ~6e-4


def test_griffin_lim_recovers_tone_magnitudes():
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.invert import griffin_lim, stft_complex

    xb = _tone_batch()
    mag = jnp.abs(stft_complex(jnp.asarray(xb), CFG))
    wav = np.asarray(griffin_lim(mag, CFG, n_iter=24))
    assert np.isfinite(wav).all()
    remag = np.asarray(jnp.abs(stft_complex(jnp.asarray(wav), CFG)))[:, : mag.shape[1]]
    mag = np.asarray(mag)[:, : remag.shape[1]]
    corr = np.corrcoef(mag.ravel(), remag.ravel())[0, 1]
    assert corr > 0.97, corr


def test_db_mel_to_audio_roundtrips_spectrogram():
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.invert import db_mel_to_audio

    xb = _tone_batch()
    db = logmel_spectrogram(jnp.asarray(xb), CFG)
    wav = np.asarray(db_mel_to_audio(db, CFG, gl_iters=16, nnls_iters=24))
    assert wav.shape[1] == (db.shape[-1] - 1) * CFG.hop_length
    assert np.abs(wav).max() <= 1.0 + 1e-6  # peak-normalized

    db2 = np.asarray(logmel_spectrogram(jnp.asarray(wav), CFG))[..., : db.shape[-1]]
    db1 = np.asarray(db)[..., : db2.shape[-1]]
    mae = np.abs(db1 - db2).mean()
    corr = np.corrcoef(db1.ravel(), db2.ravel())[0, 1]
    assert mae < 3.0, mae       # dB — reconstruction preserves the spectrogram
    assert corr > 0.9, corr


def test_spec_to_wav_cli_png_and_npy(tmp_path):
    import jax.numpy as jnp
    from scipy.io import wavfile

    from spectrogramgenai_tpu.audio.export import save_generated_png, save_spectrogram_npy
    from spectrogramgenai_tpu.cli import spec_to_wav

    xb = _tone_batch()
    db = np.asarray(logmel_spectrogram(jnp.asarray(xb), CFG))
    in_dir = tmp_path / "specs"
    in_dir.mkdir()
    # PNG input: the generated-sample uint8 contract (dB scaled to [0,255])
    img = np.clip((db[0] + CFG.top_db) / CFG.top_db * 255.0, 0, 255).astype(np.uint8)
    save_generated_png(img, str(in_dir / "a_gen_imgs_0_0.png"))
    save_spectrogram_npy(db[1], str(in_dir / "b.npy"))

    out_dir = tmp_path / "wavs"
    written = spec_to_wav.run(str(in_dir), str(out_dir), batch_size=2, gl_iters=4,
                              nnls_iters=8, sample_rate=CFG.sample_rate)
    assert written == 2
    sr, data = wavfile.read(out_dir / "b.wav")
    assert sr == CFG.sample_rate
    assert data.dtype == np.int16 and np.abs(data).max() > 1000  # audible signal

    sr48, _ = None, None
    written = spec_to_wav.run(str(in_dir), str(tmp_path / "wavs48"), batch_size=2,
                              gl_iters=2, nnls_iters=4, sample_rate=CFG.sample_rate,
                              out_sr=48000, limit=1)
    assert written == 1
    sr48, d48 = wavfile.read(tmp_path / "wavs48" / "a_gen_imgs_0_0.wav")
    assert sr48 == 48000 and d48.size > 0


def test_spec_to_wav_cli_uses_spectrogram_config_shapes(tmp_path):
    # a non-default mel/frame geometry must build a matching config, not crash
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.export import save_spectrogram_npy
    from spectrogramgenai_tpu.cli import spec_to_wav

    cfg = SpectrogramConfig(sample_rate=8000, n_fft=512, hop_length=128, n_mels=32,
                            num_frames=40, clip_seconds=0.7)
    x = _tone_batch()[:, : cfg.clip_samples]
    db = np.asarray(logmel_spectrogram(jnp.asarray(x), cfg))[..., : cfg.num_frames]
    in_dir = tmp_path / "s"
    in_dir.mkdir()
    save_spectrogram_npy(db[0], str(in_dir / "x.npy"))
    written = spec_to_wav.run(str(in_dir), str(tmp_path / "w"), batch_size=1,
                              gl_iters=2, nnls_iters=4, sample_rate=8000)
    assert written == 1


def test_inversion_runs_data_parallel_over_mesh():
    # the spec_to_wav / serving-audio path sharded over the 8-device CPU
    # mesh: batch-sharded inputs produce the same waveforms as unsharded
    import jax
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.invert import db_mel_to_audio
    from spectrogramgenai_tpu.core.mesh import MeshSpec, batch_sharding, create_mesh

    mesh = create_mesh(MeshSpec(data=8, model=1))
    xb = np.tile(_tone_batch(), (4, 1))  # batch 8
    db = logmel_spectrogram(jnp.asarray(xb), CFG)
    ref = np.asarray(db_mel_to_audio(db, CFG, gl_iters=4, nnls_iters=8))

    sharded = jax.device_put(np.asarray(db), batch_sharding(mesh, 3))
    got = db_mel_to_audio(sharded, CFG, gl_iters=4, nnls_iters=8)
    assert len(got.sharding.device_set) == 8  # stayed distributed
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_istft_matches_torch_oracle():
    # torch.istft (center=True, same hann window) is an independent oracle
    # for the overlap-add + NOLA normalization + center-trim semantics
    import jax.numpy as jnp
    import torch

    from spectrogramgenai_tpu.audio.invert import istft, stft_complex
    from spectrogramgenai_tpu.audio.spectrogram import _constants

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, CFG.sample_rate)).astype(np.float32)
    spec = np.asarray(stft_complex(jnp.asarray(x), CFG))  # (B, T, F)
    win, _ = _constants(CFG)
    ref = torch.istft(torch.from_numpy(spec.copy()).transpose(1, 2).contiguous(),
                      n_fft=CFG.n_fft, hop_length=CFG.hop_length,
                      window=torch.from_numpy(win.copy()), center=True,
                      length=x.shape[1]).numpy()
    ours = np.asarray(istft(jnp.asarray(spec), CFG, length=x.shape[1]))
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_generate_cli_write_audio_helper(tmp_path):
    # the --audio_dir hook: in-memory uint8 samples → {png stem}.wav files
    from scipy.io import wavfile

    from spectrogramgenai_tpu.cli.generate import _write_audio

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (3, 16, 16, 1), dtype=np.uint8)
    paths = [f"imgs/a_gen_imgs_{i}_0.png" for i in range(3)]
    _write_audio(imgs, paths, str(tmp_path), out_sr=None)
    for i in range(3):
        sr, data = wavfile.read(tmp_path / f"a_gen_imgs_{i}_0.wav")
        assert data.dtype == np.int16 and data.size > 0


def test_viridis_png_roundtrip_is_exact(tmp_path):
    # load_generated_spec_uint8 must invert the viridis colormap save up to
    # the LUT's own uint8 quantization collisions (±1 level; convert('L')
    # luminance warps up to ~41/255 and non-monotonically)
    from spectrogramgenai_tpu.audio.export import load_generated_spec_uint8, save_generated_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 33), dtype=np.uint8)
    p = str(tmp_path / "v.png")
    save_generated_png(img, p)
    back = load_generated_spec_uint8(p)
    diff = np.abs(back.astype(int) - img.astype(int))
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 0.1  # collisions are rare


def test_griffin_lim_short_length():
    # regression: an explicit length below (T-1)*hop used to shape-mismatch
    # inside the scan (rebuilt lost frames)
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.invert import griffin_lim, stft_complex

    xb = _tone_batch()
    mag = jnp.abs(stft_complex(jnp.asarray(xb), CFG))
    t = mag.shape[1]
    short = (t - 2) * CFG.hop_length
    wav = np.asarray(griffin_lim(mag, CFG, n_iter=3, length=short))
    assert wav.shape == (2, short) and np.isfinite(wav).all()


def test_istft_long_length_pads_instead_of_shifting():
    # regression: when length exceeds the reconstructable span (hop >
    # n_fft//2), dynamic_slice used to clamp the start — a silent time shift
    import jax.numpy as jnp

    from spectrogramgenai_tpu.audio.invert import istft, stft_complex

    cfg = SpectrogramConfig(sample_rate=8000, n_fft=256, hop_length=192,
                            n_mels=32, num_frames=16, clip_seconds=0.5)
    x = _tone_batch()[:, : 4000]
    spec = stft_complex(jnp.asarray(x), cfg)
    t = spec.shape[1]
    avail = (t - 1) * cfg.hop_length + cfg.n_fft - cfg.n_fft // 2
    out = np.asarray(istft(spec, cfg, length=4000))
    assert out.shape == (2, 4000)
    # the recoverable prefix aligns with the input (no shift)...
    edge = cfg.n_fft
    np.testing.assert_allclose(out[:, edge : avail - edge], x[:, edge : avail - edge],
                               atol=1e-4)
    # ...and the unrecoverable tail is zero-padded
    np.testing.assert_array_equal(out[:, avail:], 0)
