"""Timing utilities: sync semantics and the pipelined timing contract."""

import jax
import jax.numpy as jnp

from spectrogramgenai_tpu.utils.benchtools import device_sync, timeit_device


def test_device_sync_returns_first_element():
    out = (jnp.full((3, 3), 7.0), {"m": jnp.ones((2,))})
    assert device_sync(out) == 7.0
    assert device_sync({"empty": ()}) == 0.0


def test_timeit_device_pipelines_with_single_end_sync():
    """fn runs warmup+iters times; the mean is wall-clock/iters (one sync)."""
    calls = []
    f = jax.jit(lambda x: x + 1)

    def fn(x):
        calls.append(1)
        return f(x)

    dt = timeit_device(fn, jnp.zeros((4,)), iters=7, warmup=3)
    assert len(calls) == 10
    assert dt >= 0.0
