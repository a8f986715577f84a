from .evaluator import (
    Accuracy,
    MultiLabelMicroF1,
    MAE,
    build_evaluator,
    cross_entropy_loss,
    bce_with_logits_loss,
    masked_cross_entropy,
    masked_accuracy,
)

__all__ = [
    "Accuracy", "MultiLabelMicroF1", "MAE", "build_evaluator",
    "cross_entropy_loss", "bce_with_logits_loss",
    "masked_cross_entropy", "masked_accuracy",
]
