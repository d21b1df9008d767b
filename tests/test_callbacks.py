"""Callback unit tests: CSVLogger, EarlyStopping, ModelCheckpoint, LR monitor.

Driven with fake trainers (no fits) so the module stays fast; the callbacks'
integration with the real fit loop is covered by test_engine/test_trainer_
interrupt side effects.
"""

import csv
import os
from types import SimpleNamespace

import pytest

from pytorch_retinanet_tpu.engine import (
    CSVLogger,
    EarlyStopping,
    LearningRateMonitor,
    ModelCheckpoint,
)


def fake_trainer(epoch=0, step=0):
    return SimpleNamespace(
        current_epoch=epoch, global_step=step, should_stop=False,
        current_lr=0.01, saved=[],
        save_checkpoint=lambda path, **kw: None,
    )


class TestCSVLogger:
    def test_rows_and_union_header(self, tmp_path):
        lg = CSVLogger(save_dir=str(tmp_path), name="exp")
        lg.on_epoch_end(fake_trainer(0, 4), {"train_loss": 1.0})
        # a key appearing later must still land in the header (pl behavior)
        lg.on_epoch_end(fake_trainer(1, 8), {"train_loss": 0.5, "val_loss": 0.7})
        path = os.path.join(str(tmp_path), "exp", "version_0", "metrics.csv")
        with open(path) as f:
            rows = list(csv.DictReader(f))
        assert rows[0]["epoch"] == "0" and rows[0]["step"] == "4"
        assert rows[0]["val_loss"] == ""  # pre-key row gets an empty cell
        assert rows[1]["val_loss"] == "0.7"
        assert float(rows[1]["train_loss"]) == 0.5

    def test_version_autoincrement_and_pin(self, tmp_path):
        a = CSVLogger(save_dir=str(tmp_path), name="exp")
        a.on_epoch_end(fake_trainer(), {})
        b = CSVLogger(save_dir=str(tmp_path), name="exp")
        b.on_epoch_end(fake_trainer(), {})
        assert a.log_dir.endswith("version_0")
        assert b.log_dir.endswith("version_1")
        pinned = CSVLogger(save_dir=str(tmp_path), name="exp", version=7)
        assert pinned.log_dir.endswith("version_7")

    def test_rewrite_per_epoch_survives_interrupt(self, tmp_path):
        """Every epoch rewrites the full file — a preempted run keeps all
        rows logged so far (pairs with Trainer.save_on_interrupt)."""
        lg = CSVLogger(save_dir=str(tmp_path))
        for e in range(3):
            lg.on_epoch_end(fake_trainer(e, e * 2), {"loss": 1.0 / (e + 1)})
            with open(os.path.join(lg.log_dir, "metrics.csv")) as f:
                assert len(list(csv.DictReader(f))) == e + 1

    def test_log_hyperparams_yaml(self, tmp_path):
        from pytorch_retinanet_tpu import OmegaConf

        lg = CSVLogger(save_dir=str(tmp_path))
        lg.log_hyperparams(OmegaConf.create({"model": {"num_classes": 3}}))
        text = open(os.path.join(lg.log_dir, "hparams.yaml")).read()
        assert "num_classes" in text and "3" in text

    def test_trainer_logger_kwarg_wiring(self, tmp_path):
        from pytorch_retinanet_tpu import Trainer

        lg = CSVLogger(save_dir=str(tmp_path))
        trainer = Trainer(max_epochs=1, checkpoint_dir=None, logger=lg)
        assert lg in trainer.callbacks and trainer.logger is lg
        # pl semantics: True (default logger) and False both mean "none" here
        assert Trainer(max_epochs=1, checkpoint_dir=None).logger is None
        assert Trainer(
            max_epochs=1, checkpoint_dir=None, logger=False
        ).logger is None


class TestTensorBoardLogger:
    """engine/tb.py: the dependency-free event-file writer must emit
    spec-conforming TFRecord/protobuf bytes (crc-checked independent reader)."""

    def test_crc32c_known_vector(self):
        from pytorch_retinanet_tpu.engine.tb import crc32c

        # RFC 3720 appendix / canonical CRC-32C check value
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"") == 0

    def test_event_file_roundtrip(self, tmp_path):
        from pytorch_retinanet_tpu.engine import TensorBoardLogger
        from pytorch_retinanet_tpu.engine.tb import read_events

        lg = TensorBoardLogger(save_dir=str(tmp_path), name="exp")
        lg.on_epoch_end(fake_trainer(0, 4), {"train_loss": 1.25})
        # step > 127 exercises multi-byte varints; a second tag per event too
        lg.on_epoch_end(fake_trainer(1, 300), {"train_loss": 0.5, "AP": 0.31})
        lg.on_train_end(fake_trainer())

        files = [f for f in os.listdir(lg.log_dir) if f.startswith("events.out")]
        assert len(files) == 1
        events = read_events(os.path.join(lg.log_dir, files[0]))
        assert events[0]["file_version"] == "brain.Event:2"
        assert events[1]["step"] == 4
        assert events[1]["values"]["train_loss"] == pytest.approx(1.25)
        assert events[2]["step"] == 300
        assert events[2]["values"]["AP"] == pytest.approx(0.31, abs=1e-6)
        assert events[2]["values"]["epoch"] == pytest.approx(1.0)

    def test_nan_metrics_dropped_and_versioning(self, tmp_path):
        from pytorch_retinanet_tpu.engine import TensorBoardLogger
        from pytorch_retinanet_tpu.engine.tb import read_events

        lg = TensorBoardLogger(save_dir=str(tmp_path), name="exp")
        lg.on_epoch_end(fake_trainer(0, 1), {"ok": 2.0, "bad": float("nan")})
        assert lg.log_dir.endswith("version_0")
        files = [f for f in os.listdir(lg.log_dir) if f.startswith("events.out")]
        (ev,) = [e for e in read_events(os.path.join(lg.log_dir, files[0]))
                 if e["values"]]
        assert "bad" not in ev["values"] and ev["values"]["ok"] == 2.0
        assert TensorBoardLogger(
            save_dir=str(tmp_path), name="exp"
        ).log_dir.endswith("version_1")

    def test_log_hyperparams_and_trainer_wiring(self, tmp_path):
        from pytorch_retinanet_tpu import OmegaConf, Trainer
        from pytorch_retinanet_tpu.engine import TensorBoardLogger

        lg = TensorBoardLogger(save_dir=str(tmp_path))
        lg.log_hyperparams(OmegaConf.create({"model": {"num_classes": 3}}))
        assert "num_classes" in open(
            os.path.join(lg.log_dir, "hparams.yaml")
        ).read()
        trainer = Trainer(max_epochs=1, checkpoint_dir=None, logger=lg)
        assert trainer.logger is lg and lg in trainer.callbacks


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = EarlyStopping(monitor="val_loss", patience=2, mode="min")
        t = fake_trainer()
        es.on_epoch_end(t, {"val_loss": 1.0})   # best
        es.on_epoch_end(t, {"val_loss": 1.1})   # bad 1
        assert not t.should_stop
        es.on_epoch_end(t, {"val_loss": 1.2})   # bad 2 -> stop
        assert t.should_stop

    def test_improvement_resets_counter(self):
        es = EarlyStopping(monitor="val_loss", patience=2, mode="min")
        t = fake_trainer()
        for v in (1.0, 1.1, 0.9, 1.0):  # improvement at 0.9 resets
            es.on_epoch_end(t, {"val_loss": v})
        assert not t.should_stop

    def test_max_mode_and_min_delta(self):
        es = EarlyStopping(monitor="AP", patience=1, mode="max", min_delta=0.05)
        t = fake_trainer()
        es.on_epoch_end(t, {"AP": 0.50})
        es.on_epoch_end(t, {"AP": 0.52})  # +0.02 < min_delta -> not improved
        assert t.should_stop

    def test_missing_metric_is_ignored(self):
        es = EarlyStopping(monitor="val_loss", patience=1)
        t = fake_trainer()
        es.on_epoch_end(t, {"train_loss": 1.0})
        es.on_epoch_end(t, {"train_loss": 1.0})
        assert not t.should_stop


class TestModelCheckpoint:
    def _trainer_recording_saves(self):
        t = fake_trainer()
        t.save_checkpoint = lambda path, **kw: t.saved.append(path)
        return t

    def test_last_and_best(self, tmp_path):
        mc = ModelCheckpoint(dirpath=str(tmp_path), monitor="val_loss")
        t = self._trainer_recording_saves()
        mc.on_epoch_end(t, {"val_loss": 1.0})
        mc.on_epoch_end(t, {"val_loss": 2.0})  # worse: last only
        mc.on_epoch_end(t, {"val_loss": 0.5})  # better: last + best
        lasts = [p for p in t.saved if p.endswith("last")]
        bests = [p for p in t.saved if p.endswith("best")]
        assert len(lasts) == 3 and len(bests) == 2
        assert mc.best == 0.5


class TestLearningRateMonitor:
    def test_logs_lr_into_metrics(self):
        m = {}
        LearningRateMonitor().on_epoch_end(fake_trainer(), m)
        assert m["lr"] == 0.01
