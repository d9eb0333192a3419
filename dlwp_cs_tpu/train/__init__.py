"""Training: jitted step, optimizer wiring, trainer loop, early stopping."""

from dlwp_cs_tpu.train.train_step import (
    TrainState,
    init_state,
    make_eval_step,
    make_loss_fn,
    make_optimizer,
    make_scanned_train_step,
    make_train_step,
)
from dlwp_cs_tpu.train.sequence import (
    make_sequence_loss,
    make_sequence_train_step,
    make_sharded_sequence_train_step,
)
from dlwp_cs_tpu.train.trainer import EarlyStoppingMin, History, Trainer

__all__ = [
    "TrainState",
    "init_state",
    "make_eval_step",
    "make_loss_fn",
    "make_optimizer",
    "make_scanned_train_step",
    "make_train_step",
    "make_sequence_loss",
    "make_sequence_train_step",
    "make_sharded_sequence_train_step",
    "EarlyStoppingMin",
    "History",
    "Trainer",
]
