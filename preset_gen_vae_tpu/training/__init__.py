from .schedulers import ReduceLROnPlateau
from .train_step import TrainState, create_train_state, make_eval_step, make_train_step

__all__ = [
    "ReduceLROnPlateau",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
