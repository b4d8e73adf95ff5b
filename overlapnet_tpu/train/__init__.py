from overlapnet_tpu.train.losses import (
    combined_loss,
    orientation_target,
    sigmoid_overlap_loss,
    weighted_orientation_entropy,
)
from overlapnet_tpu.train.schedule import reference_lr_schedule
from overlapnet_tpu.train.trainer import TrainState, Trainer, make_train_step

__all__ = [
    "TrainState",
    "Trainer",
    "combined_loss",
    "make_train_step",
    "orientation_target",
    "reference_lr_schedule",
    "sigmoid_overlap_loss",
    "weighted_orientation_entropy",
]
