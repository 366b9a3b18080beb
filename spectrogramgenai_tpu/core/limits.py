"""Backend safety limits for sampling batch sizes.

Measured on the axon-tunneled v5e chip (PARITY.md perf notes): a reverse
chain at 54 labels (internal batch 108 with CFG's cond/uncond doubling) runs
fine; at ≥81 labels the TPU worker hard-faults and takes ~10 minutes to
recover. Because one operator typo on ``--serve_batch`` must not cost chip
downtime, any entry point that compiles a sampling chain refuses label
batches above the measured-safe bound unless explicitly forced.

The limit only applies to real TPU backends — CPU meshes (tests, dryruns)
just get slow, not dead.
"""

from __future__ import annotations

# Largest label batch actually measured to complete on the axon v5e worker
# (54 labels × 2 CFG = internal 108). 81 labels is measured to crash the
# worker; 55..80 are untested and not worth a 10-minute recovery to probe.
MAX_SAFE_LABEL_BATCH = 54


class UnsafeBatchError(ValueError):
    """Raised when a sampling batch exceeds the measured-safe TPU bound."""


def check_sampling_label_batch(num_labels: int, *, force: bool = False,
                               backend: str | None = None) -> None:
    """Refuse label batches the TPU backend is known to crash on.

    Parameters
    ----------
    num_labels : labels per reverse chain (internal batch is 2× with CFG).
    force : escape hatch (``--force_batch``) for non-axon TPU deployments
        where larger batches may be safe.
    backend : jax backend name; defaults to ``jax.default_backend()``.
        Non-TPU backends are never restricted.
    """
    if force:
        return
    if backend is None:
        import jax

        backend = jax.default_backend()
    if backend != "tpu":
        return
    if num_labels > MAX_SAFE_LABEL_BATCH:
        raise UnsafeBatchError(
            f"label batch {num_labels} exceeds the measured-safe bound of "
            f"{MAX_SAFE_LABEL_BATCH} on the TPU backend (≥81 labels is "
            f"measured to hard-crash the axon TPU worker, ~10 min recovery). "
            f"Pass force_batch/--force_batch to override on hardware known "
            f"to handle it."
        )
