"""Training/eval harness: Trainer, task module, optimizers, callbacks."""

from .callbacks import (
    Callback,
    CSVLogger,
    EarlyStopping,
    LearningRateMonitor,
    ModelCheckpoint,
    TensorBoardLogger,
)
from .model import RetinaNetModel
from .optim import (
    OPTIMIZER_REGISTRY,
    SCHEDULER_REGISTRY,
    build_optimizer,
    build_scheduler,
)
from .trainer import Trainer, TrainState

__all__ = [
    "Callback",
    "CSVLogger",
    "EarlyStopping",
    "LearningRateMonitor",
    "ModelCheckpoint",
    "OPTIMIZER_REGISTRY",
    "RetinaNetModel",
    "SCHEDULER_REGISTRY",
    "TensorBoardLogger",
    "Trainer",
    "TrainState",
    "build_optimizer",
    "build_scheduler",
]
