"""Misc utilities with reference parity (SURVEY.md §2.3 T10).

Covers the reference's grab-bag helpers: seeding, timing, DCGAN-style init,
one-hot/class-plane ops, softmax helpers, dataset redistribution.
"""

from __future__ import annotations

import random
import time

import jax
import jax.numpy as jnp
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX key (diff_utils.py:15-32
    equivalent; JAX determinism comes from explicit keys, not global state)."""
    np.random.seed(seed % (2**32 - 1))
    random.seed(seed)
    return jax.random.PRNGKey(seed)


class Stopwatch:
    """tic/toc wall-clock timing (helpers.py:33-42)."""

    def __init__(self):
        self._t0 = None

    def tic(self):
        self._t0 = time.time()

    def toc(self, verbose: bool = True) -> float:
        dt = time.time() - (self._t0 or time.time())
        if verbose:
            print(f"Elapsed time: {dt:.6f} seconds.")
        return dt


def dcgan_initializer():
    """N(0, 0.02) conv/dense init (reference weights_init, helpers.py:1199-1205).

    Usage: pass as kernel_init to flax layers when DCGAN-style init is wanted.
    """
    return jax.nn.initializers.normal(stddev=0.02)


def onehot(labels: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(labels, num_classes)


def add_class_channels(x: jax.Array, labels: jax.Array, num_classes: int) -> jax.Array:
    """Concatenate per-class indicator planes to NHWC images
    (reference add_class_channels, helpers.py:1184-1195)."""
    b, h, w, c = x.shape
    planes = jax.nn.one_hot(labels, num_classes)[:, None, None, :]
    planes = jnp.broadcast_to(planes, (b, h, w, num_classes))
    return jnp.concatenate([x, planes], axis=-1)


def softmax_np(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """NumPy softmax (reference softmax_np, helpers.py:45-50)."""
    e = np.exp(x - np.max(x, axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def compute_acc(preds: np.ndarray, labels: np.ndarray) -> float:
    """argmax accuracy (reference compute_acc, helpers.py:1209-1214)."""
    return float(np.mean(np.argmax(preds, axis=-1) == labels))


def prop_counts(df) -> "pd.Series":
    """Normalized class proportions (reference prop_counts, helpers.py:293-294)."""
    return df["common_name"].value_counts(normalize=True).sort_index()


def redistribute_datasets(test_df, train_df, val_df, min_test: int = 2):
    """Move samples test→train/val for over-represented test classes
    (reference redistribute_datasets, helpers.py:1257-1303 capability):
    for each class, keep at most `min_test` examples in test and alternate
    the surplus between train and val."""
    import pandas as pd

    test_df = test_df.copy()
    moves_train, moves_val = [], []
    for cname, group in test_df.groupby("common_name"):
        surplus = group.iloc[min_test:]
        for j, (idx, row) in enumerate(surplus.iterrows()):
            (moves_train if j % 2 == 0 else moves_val).append(idx)
    train_df = pd.concat([train_df, test_df.loc[moves_train]], ignore_index=True)
    val_df = pd.concat([val_df, test_df.loc[moves_val]], ignore_index=True)
    test_df = test_df.drop(moves_train + moves_val).reset_index(drop=True)
    return test_df, train_df, val_df
