"""T10 misc-helper parity tests (reference helpers.py / diff_utils.py grab-bag:
set_seed, tic/toc, DCGAN init, onehot/class planes, softmax_np, compute_acc,
prop_counts)."""

import numpy as np
import jax
import jax.numpy as jnp

from spectrogramgenai_tpu.utils.misc import (
    Stopwatch,
    add_class_channels,
    compute_acc,
    dcgan_initializer,
    onehot,
    prop_counts,
    set_seed,
    softmax_np,
)


def test_set_seed_deterministic():
    k1 = set_seed(42)
    a = np.random.rand(3)
    k2 = set_seed(42)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    x1 = jax.random.normal(k1, (4,))
    x2 = jax.random.normal(k2, (4,))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_stopwatch_tic_toc(capsys):
    sw = Stopwatch()
    sw.tic()
    dt = sw.toc(verbose=True)
    assert dt >= 0.0
    assert "Elapsed time" in capsys.readouterr().out
    assert sw.toc(verbose=False) >= dt


def test_dcgan_initializer_stats():
    # reference weights_init: N(0, 0.02) (helpers.py:1199-1205)
    init = dcgan_initializer()
    w = init(jax.random.PRNGKey(0), (64, 64), jnp.float32)
    assert abs(float(jnp.mean(w))) < 5e-3
    assert abs(float(jnp.std(w)) - 0.02) < 5e-3


def test_onehot_and_class_planes():
    labels = jnp.asarray([0, 2])
    oh = onehot(labels, 3)
    np.testing.assert_array_equal(np.asarray(oh), [[1, 0, 0], [0, 0, 1]])

    # add_class_channels (helpers.py:1184-1195): NHWC + per-class indicator planes
    x = jnp.ones((2, 4, 4, 1))
    out = add_class_channels(x, labels, 3)
    assert out.shape == (2, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(out[0, :, :, 1]), np.ones((4, 4)))
    np.testing.assert_array_equal(np.asarray(out[0, :, :, 2]), np.zeros((4, 4)))
    np.testing.assert_array_equal(np.asarray(out[1, :, :, 3]), np.ones((4, 4)))


def test_softmax_np_and_compute_acc():
    logits = np.array([[1.0, 2.0, 3.0], [1000.0, 1000.0, 1000.0]])
    p = softmax_np(logits)
    np.testing.assert_allclose(p.sum(axis=-1), [1.0, 1.0], atol=1e-12)
    assert np.all(np.isfinite(p))  # max-subtraction guards overflow
    np.testing.assert_allclose(p[1], [1 / 3] * 3, atol=1e-12)

    preds = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    assert compute_acc(preds, np.array([1, 0, 0])) == 2 / 3


def test_prop_counts():
    import pandas as pd

    df = pd.DataFrame({"common_name": ["a", "a", "b", "c"]})
    props = prop_counts(df)
    np.testing.assert_allclose(props.values, [0.5, 0.25, 0.25])
    assert list(props.index) == ["a", "b", "c"]
