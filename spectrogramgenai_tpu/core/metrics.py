"""Structured metrics sink: one JSONL stream + reference-schema CSV mirrors.

The reference scatters observability across wandb (DDPM), ad-hoc CSVs (GAN:
train_acgan.py:326-344; classifiers: helpers.py:870-922) and stdout. Here
every trainer logs through one MetricsLogger:

  * ``metrics.jsonl`` — every scalar, one JSON object per log call
    (step, wall-time, and the scalars) — the machine-readable stream.
  * optional per-run CSV with a fixed column schema, so the reference's
    offline R aggregation workflow (SURVEY.md §2.4 E5) keeps working.
  * optional wandb adapter if wandb is importable (it is not baked into the
    image; the adapter degrades to a no-op).
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Iterable


class MetricsLogger:
    def __init__(self, run_dir: str, csv_name: str | None = None, csv_columns: Iterable[str] | None = None,
                 use_wandb: bool = False, wandb_project: str | None = None):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a", buffering=1)
        self._csv_path = os.path.join(run_dir, csv_name) if csv_name else None
        self._csv_columns = list(csv_columns) if csv_columns else None
        self._csv_started = self._csv_path is not None and os.path.exists(self._csv_path)
        self._t0 = time.time()

        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: PLC0415

                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(project=wandb_project or "spectrogramgenai_tpu")
            except ImportError:
                self._wandb = None

    def log(self, step: int, **scalars):
        record = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        record.update({k: (float(v) if hasattr(v, "__float__") else v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def log_artifact(self, path: str, name: str = "model", type: str = "model",
                     description: str | None = None, metadata: dict | None = None) -> bool:
        """Log a checkpoint directory/file as a wandb Artifact (reference
        diff_modules.py:513-523). No-op (returns False) without wandb."""
        if self._wandb is None:
            return False
        at = self._wandb.Artifact(name, type=type, description=description,
                                  metadata=metadata or {})
        if os.path.isdir(path):
            at.add_dir(path)
        else:
            at.add_file(path)
        self._wandb.log_artifact(at)
        return True

    def log_images(self, step: int, images: dict) -> bool:
        """Log image panels (HWC/HW uint8 or float arrays) to wandb — the
        reference's per-log_images_epoch sampled-image panels
        (diff_modules.py:482-487,570). No-op (returns False) without wandb;
        the PNGs on disk under the run dir remain the offline record."""
        if self._wandb is None:
            return False
        self._wandb.log(
            {name: self._wandb.Image(img) for name, img in images.items()}, step=step
        )
        return True

    def log_csv_row(self, row: dict):
        """Append a row to the run CSV (reference-schema mirror)."""
        if self._csv_path is None:
            raise ValueError("MetricsLogger constructed without csv_name")
        columns = self._csv_columns or list(row.keys())
        write_header = not self._csv_started
        with open(self._csv_path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=columns, extrasaction="ignore")
            if write_header:
                writer.writeheader()
            writer.writerow({k: row.get(k, "") for k in columns})
        self._csv_started = True

    def close(self):
        self._jsonl.close()
        if self._wandb is not None and self._wandb.run is not None:
            self._wandb.finish()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
