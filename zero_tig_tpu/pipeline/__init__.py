from .spatial import train_step_spatial
from .steps import (
    TrainState,
    predict_chunk,
    predict_chunk_pipelined,
    train_chunk,
    eval_forward_step,
    init_train_state,
    make_optimizer,
    predict_step,
    train_step,
    train_step_split,
)

__all__ = [
    "TrainState",
    "predict_chunk",
    "predict_chunk_pipelined",
    "train_chunk",
    "eval_forward_step",
    "init_train_state",
    "make_optimizer",
    "predict_step",
    "train_step",
    "train_step_split",
    "train_step_spatial",
]
