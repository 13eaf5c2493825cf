from .rnnt_loss import rnnt_loss, rnnt_loss_from_logprobs
from .step import TrainState, label_contexts, make_train_step, transducer_loss_fn

__all__ = [
    "rnnt_loss",
    "rnnt_loss_from_logprobs",
    "make_train_step",
    "transducer_loss_fn",
    "label_contexts",
    "TrainState",
]
