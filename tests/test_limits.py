"""Sampling-batch safety guard (core/limits.py).

An operator typo on --serve_batch must not cost ~10 min of axon-TPU-worker
recovery: label batches past the measured-safe 54 are refused on the TPU
backend unless forced, and never restricted on CPU (tests/dryruns).
"""

import pytest

from spectrogramgenai_tpu.core.limits import (
    MAX_SAFE_LABEL_BATCH,
    UnsafeBatchError,
    check_sampling_label_batch,
)


def test_safe_batches_pass_on_tpu():
    for n in (1, 27, MAX_SAFE_LABEL_BATCH):
        check_sampling_label_batch(n, backend="tpu")


def test_unsafe_batch_refused_on_tpu():
    with pytest.raises(UnsafeBatchError, match="measured-safe"):
        check_sampling_label_batch(MAX_SAFE_LABEL_BATCH + 1, backend="tpu")
    with pytest.raises(UnsafeBatchError):
        check_sampling_label_batch(81, backend="tpu")


def test_force_overrides():
    check_sampling_label_batch(81, backend="tpu", force=True)


def test_cpu_backend_unrestricted():
    check_sampling_label_batch(4096, backend="cpu")


def test_batching_sampler_refuses_unsafe_batch():
    """The guard fires in BatchingSampler.__init__ before anything compiles."""
    from spectrogramgenai_tpu.serving.server import BatchingSampler

    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("guard only active on the TPU backend")
    with pytest.raises(UnsafeBatchError):
        BatchingSampler(None, None, batch_size=81)
