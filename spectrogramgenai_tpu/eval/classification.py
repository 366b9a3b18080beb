"""Classification metrics (jnp): the torchmetrics suite the reference uses.

Parity targets (helpers.py:408-578, 713-718, 983-995): macro precision /
recall / F1, macro accuracy, top-1/3/5 accuracy (the reference reports them
as 1−acc "error" columns — the CSV writers do that conversion), streaming
confusion matrix, and a sklearn-style classification report.

Macro semantics match torchmetrics' defaults: per-class scores averaged over
classes; a class with no support contributes 0 (not NaN) to the macro mean.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(preds: jax.Array, labels: jax.Array, num_classes: int) -> jax.Array:
    """(N,) preds, (N,) labels → (num_classes, num_classes) counts; rows = true."""
    idx = labels * num_classes + preds
    flat = jnp.bincount(idx, length=num_classes * num_classes)
    return flat.reshape(num_classes, num_classes)


def macro_precision_recall_f1(cm: jax.Array):
    """Macro P/R/F1 from a confusion matrix (rows = true class)."""
    cm = cm.astype(jnp.float32)
    tp = jnp.diag(cm)
    fp = jnp.sum(cm, axis=0) - tp
    fn = jnp.sum(cm, axis=1) - tp
    precision = jnp.where(tp + fp > 0, tp / (tp + fp), 0.0)
    recall = jnp.where(tp + fn > 0, tp / (tp + fn), 0.0)
    f1 = jnp.where(precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0)
    return jnp.mean(precision), jnp.mean(recall), jnp.mean(f1)


def macro_accuracy(cm: jax.Array) -> jax.Array:
    """torchmetrics multiclass accuracy with macro averaging = macro recall."""
    cm = cm.astype(jnp.float32)
    tp = jnp.diag(cm)
    support = jnp.sum(cm, axis=1)
    per_class = jnp.where(support > 0, tp / support, 0.0)
    return jnp.mean(per_class)


def top_k_accuracy(logits: jax.Array, labels: jax.Array, k: int) -> jax.Array:
    """Micro top-k accuracy over the batch."""
    topk = jax.lax.top_k(logits, k)[1]
    hit = jnp.any(topk == labels[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))


@dataclasses.dataclass
class ClassificationMetrics:
    """Streaming accumulator across eval batches (host-side reduction)."""

    num_classes: int
    cm: np.ndarray = None
    topk_hits: dict = None
    n: int = 0
    loss_sum: float = 0.0
    batches: int = 0

    def __post_init__(self):
        self.cm = np.zeros((self.num_classes, self.num_classes), np.int64)
        self.topk_hits = {1: 0, 3: 0, 5: 0}

    def update(self, logits: np.ndarray, labels: np.ndarray, loss: float | None = None):
        logits = np.asarray(logits)
        labels = np.asarray(labels)
        preds = logits.argmax(axis=-1)
        np.add.at(self.cm, (labels, preds), 1)
        order = np.argsort(-logits, axis=-1)
        for k in self.topk_hits:
            self.topk_hits[k] += int((order[:, :k] == labels[:, None]).any(axis=-1).sum())
        self.n += len(labels)
        if loss is not None:
            self.loss_sum += float(loss)
            self.batches += 1

    def compute(self) -> dict:
        cmj = jnp.asarray(self.cm)
        p, r, f1 = macro_precision_recall_f1(cmj)
        out = {
            "accuracy": float(macro_accuracy(cmj)),
            "precision": float(p),
            "recall": float(r),
            "f1": float(f1),
            "micro_accuracy": float(np.trace(self.cm) / max(1, self.n)),
        }
        for k, hits in self.topk_hits.items():
            out[f"top{k}_acc"] = hits / max(1, self.n)
            out[f"top{k}_err"] = 1.0 - out[f"top{k}_acc"]  # reference's 1−acc columns
        if self.batches:
            out["loss"] = self.loss_sum / self.batches
        return out

    def classification_report(self, class_names: list[str]) -> "pd.DataFrame":
        """sklearn-style per-class report (helpers.py:932-951 capability)."""
        import pandas as pd

        cm = self.cm.astype(np.float64)
        tp = np.diag(cm)
        fp = cm.sum(axis=0) - tp
        fn = cm.sum(axis=1) - tp
        precision = np.divide(tp, tp + fp, out=np.zeros_like(tp), where=(tp + fp) > 0)
        recall = np.divide(tp, tp + fn, out=np.zeros_like(tp), where=(tp + fn) > 0)
        f1 = np.divide(2 * precision * recall, precision + recall,
                       out=np.zeros_like(tp), where=(precision + recall) > 0)
        return pd.DataFrame(
            {"precision": precision, "recall": recall, "f1-score": f1, "support": cm.sum(axis=1)},
            index=class_names,
        )
