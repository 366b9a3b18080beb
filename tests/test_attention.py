"""Fused attention kernel vs einsum reference, and the SA module's two paths."""

import jax
import jax.numpy as jnp
import numpy as np

from spectrogramgenai_tpu.ops.attention import fused_attention

INTERPRET = jax.default_backend() != "tpu"


def einsum_attention(q, k, v):
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def test_fused_attention_matches_einsum():
    rng = np.random.default_rng(0)
    for (b, h, n, d) in [(2, 4, 1024, 16), (1, 4, 2048, 32)]:
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        got = np.asarray(fused_attention(q, k, v, interpret=INTERPRET))
        want = np.asarray(einsum_attention(q, k, v))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_sa_module_paths_equivalent():
    from spectrogramgenai_tpu.models.layers import SpatialSelfAttention

    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 64)), jnp.float32)
    sa = SpatialSelfAttention(channels=64)
    variables = sa.init(jax.random.PRNGKey(0), x)
    ref = sa.apply(variables, x)

    if INTERPRET:
        # Fused path requires the TPU kernel; on CPU just check the flag
        # falls back or interpret-mode matches.
        import spectrogramgenai_tpu.ops.attention as attn_mod
        import functools

        orig = attn_mod.fused_attention
        attn_mod.fused_attention = functools.partial(orig, interpret=True)
        try:
            sa_fused = SpatialSelfAttention(channels=64, fused=True)
            out = sa_fused.apply(variables, x)
        finally:
            attn_mod.fused_attention = orig
    else:
        sa_fused = SpatialSelfAttention(channels=64, fused=True)
        out = sa_fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_grads_match_einsum():
    """Custom-VJP (flash-style recompute backward) vs autodiff-through-einsum,
    including dK/dV accumulation across multiple q-blocks."""
    rng = np.random.default_rng(2)
    b, h, n, d = 1, 2, 512, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, q_block=128, interpret=INTERPRET) * w)

    def loss_einsum(q, k, v):
        return jnp.sum(einsum_attention(q, k, v) * w)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_einsum, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=5e-4, err_msg=f"d{name}")


def test_fused_attention_rejects_nondivisible_n():
    # the kernel grid floors n // q_block — silently dropping trailing query
    # tokens must be an error, not garbage output
    import pytest

    q = jnp.zeros((1, 1, 320, 16))
    with pytest.raises(ValueError, match="not divisible"):
        fused_attention(q, q, q, interpret=INTERPRET)


def test_fused_attention_underflow_row_no_nan():
    # a uniformly huge-negative score row must not produce 0/0 NaNs: the
    # max-subtracted softmax bounds the denominator in [1, N]
    n, d = 256, 16
    q = jnp.full((1, 1, n, d), 100.0)
    k = jnp.full((1, 1, n, d), -100.0)  # scores = -d·10⁴·scale
    v = jnp.ones((1, 1, n, d))
    out = fused_attention(q, k, v, q_block=128, interpret=INTERPRET)
    assert np.isfinite(np.asarray(out)).all()
    # uniform probs over a constant V row → output ≈ 1
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-3)


def test_fused_attention_large_logits_exact():
    # logits whose max·scale far exceeds the old ±60 clamp: the
    # max-subtracted softmax must still match the einsum reference
    # (the clamp variant flattened such rows toward uniform), and the
    # custom VJP must match autodiff in the same regime.
    rng = np.random.default_rng(7)
    b, h, n, d = 1, 2, 256, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)) * 30.0, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)) * 30.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    got = np.asarray(fused_attention(q, k, v, q_block=128, interpret=INTERPRET))
    want = np.asarray(einsum_attention(q, k, v))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-5)

    w = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    got_g = jax.grad(lambda q, k, v: jnp.sum(
        fused_attention(q, k, v, q_block=128, interpret=INTERPRET) * w), argnums=(0, 1, 2))(q, k, v)
    want_g = jax.grad(lambda q, k, v: jnp.sum(einsum_attention(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got_g, want_g, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-3, err_msg=f"d{name}")
