"""Trainer callbacks: checkpointing, early stopping, LR monitoring.

The reference delegates these to pytorch-lightning 1.0 callbacks (demo
notebook uses ``LearningRateMonitor`` and ``EarlyStopping``; auto
checkpointing is Trainer-built-in — SURVEY.md §5.4). These are the
framework-native equivalents with the same knobs.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class Callback:
    """Hook surface the Trainer drives."""

    def on_epoch_end(self, trainer, metrics: Dict[str, float]) -> None: ...
    def on_train_end(self, trainer) -> None: ...


class EarlyStopping(Callback):
    """Stop when a monitored metric stops improving (pl.callbacks.EarlyStopping
    parity: monitor/patience/mode/min_delta)."""

    def __init__(
        self,
        monitor: str = "val_loss",
        patience: int = 3,
        mode: str = "min",
        min_delta: float = 0.0,
    ):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def _improved(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return value < self.best - self.min_delta
        return value > self.best + self.min_delta

    def on_epoch_end(self, trainer, metrics: Dict[str, float]) -> None:
        value = metrics.get(self.monitor)
        if value is None or math.isnan(value):
            return
        if self._improved(value):
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                logger.info(
                    "EarlyStopping: %s did not improve for %d epochs (best %.5f)",
                    self.monitor, self.patience, self.best,
                )
                trainer.should_stop = True


class ModelCheckpoint(Callback):
    """Save checkpoints each epoch; keep the best on a monitored metric
    (pl auto-checkpointing parity)."""

    def __init__(
        self,
        dirpath: str = "checkpoints",
        monitor: Optional[str] = "val_loss",
        mode: str = "min",
        save_last: bool = True,
    ):
        self.dirpath = dirpath
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self.best: Optional[float] = None
        self.best_path: Optional[str] = None

    def on_epoch_end(self, trainer, metrics: Dict[str, float]) -> None:
        os.makedirs(self.dirpath, exist_ok=True)
        if self.save_last:
            trainer.save_checkpoint(os.path.join(self.dirpath, "last"))
        value = metrics.get(self.monitor) if self.monitor else None
        if value is None:
            return
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best)
            or (self.mode == "max" and value > self.best)
        )
        if improved:
            self.best = value
            self.best_path = os.path.join(self.dirpath, "best")
            trainer.save_checkpoint(self.best_path)
            logger.info("ModelCheckpoint: new best %s=%.5f", self.monitor, value)


class LearningRateMonitor(Callback):
    """Log the current LR each epoch (pl.callbacks.LearningRateMonitor parity)."""

    def on_epoch_end(self, trainer, metrics: Dict[str, float]) -> None:
        metrics["lr"] = trainer.current_lr
        logger.info("lr: %.6g", trainer.current_lr)
