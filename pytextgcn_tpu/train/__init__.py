from .metrics import accuracy, confusion_matrix, macro_f1, masked_cross_entropy
from .trainer import Trainer

__all__ = [
    "Trainer",
    "accuracy",
    "confusion_matrix",
    "macro_f1",
    "masked_cross_entropy",
]
