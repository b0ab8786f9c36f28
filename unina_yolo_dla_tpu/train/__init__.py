from .assigner import AssignResult, assign, decode_ltrb, make_anchors
from .losses import LossConfig, detection_loss, flatten_outputs
from .trainer import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "AssignResult", "assign", "decode_ltrb", "make_anchors",
    "LossConfig", "detection_loss", "flatten_outputs",
    "TrainConfig", "TrainState", "create_train_state",
    "make_eval_step", "make_optimizer", "make_train_step",
]
