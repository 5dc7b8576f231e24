"""Training engine (reference L4: solver_encoder.py)."""

from autovc_tpu.train.state import TrainState, ema_update, init_ema
from autovc_tpu.train.schedule import ReduceLROnPlateau, cosine_annealing
from autovc_tpu.train.step import loss_fn, make_eval_loss, make_optimizer, make_train_step
from autovc_tpu.train.metrics import MetricsLogger
from autovc_tpu.train.solver import Solver

__all__ = [
    "TrainState",
    "ema_update",
    "init_ema",
    "ReduceLROnPlateau",
    "cosine_annealing",
    "loss_fn",
    "make_eval_loss",
    "make_optimizer",
    "make_train_step",
    "MetricsLogger",
    "Solver",
]
