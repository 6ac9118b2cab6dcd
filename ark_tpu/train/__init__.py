from ark_tpu.train.state import (
    TrainState,
    create_train_state,
    cosine_annealing_lr,
    beta_for_epoch,
)
from ark_tpu.train.steps import make_train_step, make_eval_step, make_epoch_fns

__all__ = [
    "TrainState",
    "create_train_state",
    "cosine_annealing_lr",
    "beta_for_epoch",
    "make_train_step",
    "make_eval_step",
    "make_epoch_fns",
]
