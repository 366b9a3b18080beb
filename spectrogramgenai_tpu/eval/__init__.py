from spectrogramgenai_tpu.eval.classification import (
    confusion_matrix,
    macro_precision_recall_f1,
    top_k_accuracy,
    ClassificationMetrics,
)

__all__ = [
    "confusion_matrix",
    "macro_precision_recall_f1",
    "top_k_accuracy",
    "ClassificationMetrics",
]
