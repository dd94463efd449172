from air_tpu.train.state import TrainState, create_train_state, make_optimizer
from air_tpu.train.steps import make_train_step, make_eval_step
from air_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, latest_checkpoint,
)
from air_tpu.train.metrics import MetricsWriter, summarize_outputs
from air_tpu.train.trainer import Trainer, TrainerConfig

__all__ = [
    "TrainState", "create_train_state", "make_optimizer",
    "make_train_step", "make_eval_step",
    "save_checkpoint", "load_checkpoint", "latest_checkpoint",
    "MetricsWriter", "summarize_outputs",
    "Trainer", "TrainerConfig",
]
