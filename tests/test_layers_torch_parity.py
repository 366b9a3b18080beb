"""Numerical parity of UNet building blocks against torch equivalents."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")


def test_bilinear_upsample_align_corners():
    from spectrogramgenai_tpu.models.layers import upsample_bilinear_align_corners

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)  # NHWC, odd sizes
    got = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 2))

    xt = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW
    want = torch.nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)(xt)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_upsample():
    from spectrogramgenai_tpu.models.layers import upsample_nearest

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 6, 4)).astype(np.float32)
    got = np.asarray(upsample_nearest(jnp.asarray(x), 2))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    want = torch.nn.Upsample(scale_factor=2, mode="nearest")(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_groupnorm1_matches_torch():
    import flax.linen as nn

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 6)).astype(np.float32)
    gn = nn.GroupNorm(num_groups=1)
    v = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(gn.apply(v, jnp.asarray(x)))

    xt = torch.tensor(x).permute(0, 3, 1, 2)
    want = torch.nn.GroupNorm(1, 6)(xt).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sinusoidal_time_embedding_matches_reference_formula():
    from spectrogramgenai_tpu.models.layers import sinusoidal_time_embedding

    t = jnp.asarray([0.0, 1.0, 500.0, 999.0])
    emb = np.asarray(sinusoidal_time_embedding(t, 256))
    # reference formula (diff_modules.py:168-173)
    inv_freq = 1.0 / (10000 ** (np.arange(0, 128, dtype=np.float64) * 2.0 / 256))
    tt = np.asarray(t, np.float64)[:, None]
    want = np.concatenate([np.sin(tt * inv_freq), np.cos(tt * inv_freq)], axis=-1)
    np.testing.assert_allclose(emb, want, atol=1e-4)
    assert emb.shape == (4, 256)
