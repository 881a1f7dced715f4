from .steps import (
    TrainState,
    eval_forward_step,
    init_train_state,
    make_optimizer,
    predict_step,
    train_step,
)

__all__ = [
    "TrainState",
    "eval_forward_step",
    "init_train_state",
    "make_optimizer",
    "predict_step",
    "train_step",
]
