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


class TensorBoardLogger(Callback):
    """pl.loggers.TensorBoardLogger-parity sink — writes real
    ``events.out.tfevents.*`` files (engine/tb.py's dependency-free writer;
    Lightning 1.0's DEFAULT logger, which the reference Trainer runs with —
    reference README.md:42-58). Pass as ``Trainer(logger=...)``.

    Layout matches Lightning: ``<save_dir>/<name>/version_<k>/`` holding the
    event file plus ``hparams.yaml``; version auto-increments per run unless
    pinned. Scalars are logged once per epoch at the optimizer-step counter,
    so curves from a reference run and a run here line up on the same axis.
    """

    def __init__(self, save_dir: str = "logs", name: str = "default",
                 version: Optional[int] = None):
        self.save_dir = save_dir
        self.name = name
        self._version = version
        self._log_dir: Optional[str] = None
        self._writer = None

    @property
    def log_dir(self) -> str:
        if self._log_dir is None:
            base = os.path.join(self.save_dir, self.name)
            if self._version is None:
                existing = []
                if os.path.isdir(base):
                    for d in os.listdir(base):
                        if d.startswith("version_") and d[8:].isdigit():
                            existing.append(int(d[8:]))
                self._version = max(existing) + 1 if existing else 0
            self._log_dir = os.path.join(base, f"version_{self._version}")
            os.makedirs(self._log_dir, exist_ok=True)
        return self._log_dir

    @property
    def writer(self):
        if self._writer is None:
            from .tb import EventFileWriter

            self._writer = EventFileWriter(self.log_dir)
        return self._writer

    def log_hyperparams(self, hparams) -> None:
        from .. import config as _config

        try:
            text = _config.OmegaConf.to_yaml(hparams)
        except Exception:
            text = repr(hparams)
        with open(os.path.join(self.log_dir, "hparams.yaml"), "w") as f:
            f.write(text)

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        finite = {
            k: float(v)
            for k, v in metrics.items()
            if isinstance(v, (int, float)) and not math.isnan(float(v))
        }
        self.writer.add_scalars(finite, step)

    def on_epoch_end(self, trainer, metrics: Dict[str, float]) -> None:
        self.log_metrics({"epoch": trainer.current_epoch, **metrics},
                         trainer.global_step)

    def on_train_end(self, trainer) -> None:
        if self._writer is not None:
            self._writer.close()


class CSVLogger(Callback):
    """pl.loggers.CSVLogger-parity metrics sink (reference gets its loggers
    from Lightning 1.0; pass this as ``Trainer(logger=...)``).

    Writes ``<save_dir>/<name>/version_<k>/metrics.csv`` — one row per epoch,
    columns the union of every metric key seen (rows logged before a new key
    appeared get an empty cell, exactly like Lightning's) — plus
    ``hparams.yaml`` when the fitted model carries hparams. The version
    directory auto-increments per run unless ``version`` is pinned.
    """

    def __init__(self, save_dir: str = "logs", name: str = "default",
                 version: Optional[int] = None):
        self.save_dir = save_dir
        self.name = name
        self._version = version
        self._rows: list = []
        self._log_dir: Optional[str] = None

    @property
    def log_dir(self) -> str:
        if self._log_dir is None:
            base = os.path.join(self.save_dir, self.name)
            if self._version is None:
                existing = []
                if os.path.isdir(base):
                    for d in os.listdir(base):
                        if d.startswith("version_") and d[8:].isdigit():
                            existing.append(int(d[8:]))
                self._version = max(existing) + 1 if existing else 0
            self._log_dir = os.path.join(base, f"version_{self._version}")
            os.makedirs(self._log_dir, exist_ok=True)
        return self._log_dir

    def _write(self) -> None:
        import csv

        keys: list = []
        for row in self._rows:  # insertion order, first-seen first
            for k in row:
                if k not in keys:
                    keys.append(k)
        with open(os.path.join(self.log_dir, "metrics.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(self._rows)

    def log_hyperparams(self, hparams) -> None:
        """Serialize the model config next to the metrics (Lightning writes
        hparams.yaml from save_hyperparameters; the Trainer calls this with
        ``model.hparams`` when present)."""
        from .. import config as _config

        try:
            text = _config.OmegaConf.to_yaml(hparams)
        except Exception:
            text = repr(hparams)
        with open(os.path.join(self.log_dir, "hparams.yaml"), "w") as f:
            f.write(text)

    def on_epoch_end(self, trainer, metrics: Dict[str, float]) -> None:
        self._rows.append(
            {"epoch": trainer.current_epoch, "step": trainer.global_step,
             **metrics}
        )
        self._write()  # rewrite-per-epoch: crash/preemption loses nothing
