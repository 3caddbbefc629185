from .steps import (
    TrainState,
    make_eval_step,
    make_multihead_train_step,
    make_train_step,
    topk_accuracies,
)
from .train_loop import train
from .test_loop import test
from .contrastive_loop import test_contrastive, train_contrastive

__all__ = [
    "TrainState",
    "make_eval_step",
    "make_multihead_train_step",
    "make_train_step",
    "topk_accuracies",
    "train",
    "test",
    "train_contrastive",
    "test_contrastive",
]
