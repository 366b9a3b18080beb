"""Golden tests: flax ClapAudioTower vs HuggingFace's torch CLAP.

transformers ships the canonical laion-clap port (the exact model the
reference uses for FAD, fad.py:11-21). We instantiate it with random weights
(tiny config AND the real default HTSAT-tiny config), convert the state_dict
with tools/convert_clap.py, and assert the flax forward matches — covering
the bicubic resize, mel2img freq-stack, patch embed, shifted-window Swin
attention with relative position bias, patch merging, pooling, and the
projection head. The mel frontend is checked against ClapFeatureExtractor.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tools")

import jax.numpy as jnp  # noqa: E402

from convert_clap import convert_clap_audio  # noqa: E402

from spectrogramgenai_tpu.eval.clap import (  # noqa: E402
    ClapAudioTower,
    ClapAudioTowerConfig,
    clap_input_features,
    quantize_int16,
    repeatpad,
)


def _hf_model(tiny: bool):
    from transformers.models.clap.configuration_clap import ClapAudioConfig
    from transformers.models.clap.modeling_clap import ClapAudioModelWithProjection

    if tiny:
        hf_cfg = ClapAudioConfig(
            num_mel_bins=16, spec_size=64, patch_size=4, patch_stride=4,
            patch_embeds_hidden_size=8, depths=[2, 2], num_attention_heads=[2, 4],
            window_size=4, hidden_size=16, projection_dim=8, enable_fusion=False,
            num_hidden_layers=2, num_classes=5,
        )
        cfg = ClapAudioTowerConfig(
            num_mel_bins=16, spec_size=64, patch_size=4, patch_stride=4,
            patch_embeds_hidden_size=8, depths=(2, 2), num_attention_heads=(2, 4),
            window_size=4, projection_dim=8,
        )
    else:
        hf_cfg = ClapAudioConfig(enable_fusion=False)  # HTSAT-tiny defaults
        cfg = ClapAudioTowerConfig()

    torch.manual_seed(0)
    model = ClapAudioModelWithProjection(hf_cfg).eval()
    # randomize BN stats so slot mismatches can't hide behind defaults
    sd = model.state_dict()
    gen = torch.Generator().manual_seed(1)
    for key, value in sd.items():
        if key.endswith("running_var"):
            sd[key] = torch.empty_like(value).uniform_(0.5, 1.5, generator=gen)
        elif key.endswith("running_mean"):
            sd[key] = 0.2 * torch.randn(value.shape, generator=gen)
        elif "relative_position_bias_table" in key:
            sd[key] = 0.1 * torch.randn(value.shape, generator=gen)
    model.load_state_dict(sd)
    return model, cfg


def _assert_parity(tiny: bool, time_frames: int, batch: int = 2, atol: float = 2e-4):
    model, cfg = _hf_model(tiny)
    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if not k.endswith(("num_batches_tracked", "relative_position_index"))}
    variables = convert_clap_audio(sd, depths=cfg.depths)

    rng = np.random.default_rng(3)
    feats = rng.normal(size=(batch, 1, time_frames, cfg.num_mel_bins)).astype(np.float32) * 5 - 20

    with torch.inference_mode():
        want = model(input_features=torch.from_numpy(feats)).audio_embeds.numpy()

    tower = ClapAudioTower(cfg)
    got = np.asarray(tower.apply(variables, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


def test_clap_tower_tiny_golden():
    """Tiny config: fast; exercises shifted windows + interpolation
    (time 200 < spec_width 256) + patch merging."""
    _assert_parity(tiny=True, time_frames=200)


def test_clap_tower_tiny_full_frames():
    """No-interpolation path (time == spec_width)."""
    _assert_parity(tiny=True, time_frames=256)


@pytest.mark.slow
def test_clap_tower_default_config_golden():
    """The REAL HTSAT-tiny config (28M params) at the real input shape
    (1001×64 frames, bicubic → 1024): the exact reference-FAD tower."""
    _assert_parity(tiny=False, time_frames=1001, batch=1, atol=5e-4)


def test_clap_mel_frontend_matches_hf_extractor():
    """jnp mel frontend vs ClapFeatureExtractor (rand_trunc/repeatpad path,
    deterministic for clips ≤ max length): same repeatpad, same Slaney-mel
    dB features."""
    from transformers.models.clap.feature_extraction_clap import ClapFeatureExtractor

    cfg = ClapAudioTowerConfig()
    rng = np.random.default_rng(4)
    wav = (0.5 * np.sin(2 * np.pi * 880 * np.arange(96000) / 48000)
           + 0.05 * rng.standard_normal(96000)).astype(np.float32)  # 2 s

    fe = ClapFeatureExtractor(truncation="rand_trunc", padding="repeatpad")
    want = fe(quantize_int16(wav), sampling_rate=48000, return_tensors="np")["input_features"]
    got = np.asarray(clap_input_features([wav], cfg))
    assert got.shape == tuple(want.shape), (got.shape, want.shape)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-3, rtol=1e-4)


def test_repeatpad_semantics():
    wav = np.arange(5, dtype=np.float32)
    out = repeatpad(wav, 12)
    np.testing.assert_array_equal(out, np.array([0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 0], np.float32))
    np.testing.assert_array_equal(repeatpad(np.arange(20, dtype=np.float32), 12),
                                  np.arange(12, dtype=np.float32))
