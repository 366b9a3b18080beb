"""Ahead-of-time model export: serialized StableHLO sampler artifacts.

Production deployment wants a versioned, self-contained artifact — not a
Python environment that reconstructs the model. `jax.export` serializes the
jitted reverse-diffusion chain (weights baked in as constants) to bytes that
any later process can deserialize and call — no flax module code, no config,
no checkpoint layout knowledge — and that XLA ahead-of-time compiles on the
target platform. This is the TPU-native analog of the reference's
`torch.save(state_dict)` + source-code-coupled reload (diff_modules.py:512-546),
minus the source coupling.

The artifact's calling convention is `(key: uint32 PRNG key data, labels:
int32[n]) → uint8 images`, with everything else (schedule, CFG scale,
sampler type, VQ decode) frozen at export time.
"""

from __future__ import annotations

import io
import json
import zipfile

import numpy as np

_MANIFEST = "manifest.json"
_PAYLOAD = "sampler.stablehlo"
FORMAT_VERSION = 1


def export_sampler(task, state, *, num_labels: int, use_ema: bool = False,
                   sampler: str = "ddpm", num_steps: int = 50,
                   cfg_scale: float | None = None,
                   platforms: list[str] | None = None) -> bytes:
    """Serialize the full sampling chain (weights baked in) to artifact bytes.

    `num_labels` fixes the compiled batch (requests pad into it, exactly as
    serving does). `platforms` defaults to the current backend; pass e.g.
    ["tpu", "cpu"] to produce a multi-platform artifact.
    """
    import jax
    from jax import export as jexport

    cfg_scale = task.cfg.cfg_scale if cfg_scale is None else cfg_scale
    params = state.ema_params if use_ema else state.params
    params = jax.device_get(params)  # bake host constants, not device buffers

    def generate(key, labels):
        return task._sample(params, key, labels, cfg_scale=cfg_scale,
                            sampler=sampler, num_steps=num_steps)

    key_spec = jax.ShapeDtypeStruct((2,), np.uint32)  # legacy uint32[2] PRNG key
    lab_spec = jax.ShapeDtypeStruct((num_labels,), np.int32)
    exp = jexport.export(
        jax.jit(generate),
        platforms=platforms or [jax.default_backend()],
    )(key_spec, lab_spec)

    manifest = {
        "format_version": FORMAT_VERSION,
        "platforms": list(exp.platforms),
        "num_labels": num_labels,
        "sampler": sampler,
        "num_steps": num_steps,
        "cfg_scale": cfg_scale,
        "use_ema": use_ema,
        "img_size": task.cfg.img_size,
        "latent": task.cfg.latent,
        "num_classes": task.cfg.num_classes,
        "noise_steps": task.schedule.noise_steps,
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_MANIFEST, json.dumps(manifest, indent=2))
        z.writestr(_PAYLOAD, exp.serialize())
    return buf.getvalue()


class ExportedSampler:
    """Deserialized artifact: `sampler(seed, labels) → uint8 images`."""

    def __init__(self, blob: bytes):
        import jax
        from jax import export as jexport

        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            self.manifest = json.loads(z.read(_MANIFEST))
            if self.manifest["format_version"] > FORMAT_VERSION:
                raise ValueError(
                    f"artifact format {self.manifest['format_version']} is newer "
                    f"than this runtime ({FORMAT_VERSION})")
            self._exp = jexport.deserialize(z.read(_PAYLOAD))
        self._call = jax.jit(self._exp.call)

    @property
    def num_labels(self) -> int:
        return self.manifest["num_labels"]

    def __call__(self, seed: int, labels: np.ndarray) -> np.ndarray:
        """Pad/truncate-free call: labels must have exactly num_labels entries."""
        import jax
        import jax.numpy as jnp

        if labels.shape != (self.num_labels,):
            raise ValueError(f"artifact compiled for {self.num_labels} labels, "
                             f"got shape {labels.shape}")
        key = jax.random.PRNGKey(seed)  # legacy uint32[2] key, as exported
        return np.asarray(self._call(jnp.asarray(key, jnp.uint32),
                                     jnp.asarray(labels, jnp.int32)))


def save_artifact(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_artifact(path: str) -> ExportedSampler:
    with open(path, "rb") as f:
        return ExportedSampler(f.read())
