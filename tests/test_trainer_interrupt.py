"""Preemption-safe fit: SIGTERM/SIGINT checkpoints and exits cleanly.

TPU spot/preemptible VMs deliver SIGTERM with a short grace window; the
reference's Lightning 1.0 likewise saves on ctrl-C. Covered here:

  * signal during fit -> fit RETURNS (no exception), <ckpt>/interrupt written
  * the interrupted epoch is not counted: resume re-runs it, then finishes
  * a partial accumulation window is flushed before saving (mini_step == 0)
  * previous signal handlers are restored after fit
  * save_on_interrupt=False installs nothing
"""

import os
import signal

import numpy as np
import pytest

from pytorch_retinanet_tpu import OmegaConf, RetinaNetModel, Trainer


@pytest.fixture(scope="module")
def csv_dataset(tmp_path_factory):
    import cv2
    import pandas as pd

    root = tmp_path_factory.mktemp("intds")
    rows = []
    rng = np.random.default_rng(3)
    for i in range(8):
        img = np.full((100, 80, 3), 255, np.uint8)
        x1, y1 = int(rng.integers(5, 30)), int(rng.integers(5, 40))
        x2, y2 = min(x1 + 30, 79), min(y1 + 30, 99)
        cv2.rectangle(img, (x1, y1), (x2, y2), (255, 0, 0), -1)
        path = str(root / f"{i}.png")
        cv2.imwrite(path, img)
        rows.append(
            {
                "filename": path, "width": 80, "height": 100, "class": "car",
                "xmin": float(x1), "ymin": float(y1),
                "xmax": float(x2), "ymax": float(y2), "labels": 1,
            }
        )
    csv = str(root / "train.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


@pytest.fixture(scope="module")
def conf(csv_dataset):
    return OmegaConf.create(
        {
            "model": {
                "backbone_kind": "resnet18", "num_classes": 2,
                "min_size": 64, "max_size": 96, "pretrained": False,
            },
            "dataset": {
                "kind": "csv", "trn_paths": csv_dataset,
                "valid_paths": False, "test_paths": csv_dataset,
            },
            "dataloader": {
                "train_bs": 2, "valid_bs": 2, "test_bs": 2,
                "args": {"num_workers": 1},
            },
            "transforms": [],
            "optimizer": {
                "class_name": "torch.optim.SGD",
                "params": {"lr": 0.001, "momentum": 0.9},
            },
            "scheduler": {
                "class_name": "torch.optim.lr_scheduler.StepLR",
                "params": {"step_size": 1, "gamma": 0.5},
                "interval": "epoch", "frequency": 1, "monitor": False,
            },
        }
    )


def _fit_with_signal_at_batch(conf, ckpt_dir, *, n, sig, **trainer_kwargs):
    """Run fit(), raising `sig` just before the n-th train batch executes.

    A sentinel handler is pre-installed so that if the Trainer fails to
    install its own, the raised signal fails the test instead of killing
    the pytest process; the sentinel also lets us assert handler restoration.
    """
    sentinel_hits = []
    prev = signal.signal(sig, lambda s, f: sentinel_hits.append(s))
    try:
        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=2, checkpoint_dir=ckpt_dir, warmup_steps=0,
            **trainer_kwargs,
        )
        orig = trainer._device_batch
        calls = {"n": 0}

        def patched(batch):
            calls["n"] += 1
            if calls["n"] == n:
                signal.raise_signal(sig)
            return orig(batch)

        trainer._device_batch = patched
        metrics = trainer.fit(model)
        assert not sentinel_hits, "Trainer never installed its signal handler"
        assert signal.getsignal(sig) is not signal.SIG_DFL
        return model, trainer, metrics
    finally:
        signal.signal(sig, prev)


class TestInterrupt:
    def test_sigterm_saves_and_returns(self, conf, tmp_path_factory):
        ckpt = str(tmp_path_factory.mktemp("ckpt"))
        # 4 batches/epoch (8 imgs / bs 2): signal before batch 2 of epoch 0.
        _, trainer, _ = _fit_with_signal_at_batch(
            conf, ckpt, n=2, sig=signal.SIGTERM
        )
        assert trainer._interrupted
        # Batch 2 still executed (checkpoint at the step boundary, mid-epoch).
        assert trainer.global_step == 2
        assert os.path.isdir(os.path.join(ckpt, "interrupt"))
        # Interrupt skipped the epoch-scheduler step and epoch callbacks:
        # no regular per-epoch checkpoint was written for the cut epoch.
        assert trainer.current_lr == pytest.approx(0.001)

    def test_resume_reruns_interrupted_epoch(self, conf, tmp_path_factory):
        # SIGINT here doubles as coverage for the second signal type.
        ckpt = str(tmp_path_factory.mktemp("ckpt"))
        model, trainer, _ = _fit_with_signal_at_batch(
            conf, ckpt, n=2, sig=signal.SIGINT
        )
        # auto_resume discovers the interrupt save (newest in the dir) —
        # the restart-the-same-command recovery path.
        resumed = Trainer(
            max_epochs=2, checkpoint_dir=ckpt, warmup_steps=0,
            auto_resume=True,
        )
        metrics = resumed.fit(model)
        # Epoch 0 re-ran in full, then epoch 1: 2 interrupted + 2*4 resumed.
        assert resumed.current_epoch == 1
        assert resumed.global_step == 2 + 8
        # StepLR stepped exactly twice (once per COMPLETED epoch).
        assert metrics["lr"] == pytest.approx(0.001 * 0.25)
        assert np.isfinite(metrics["train_loss"])

    def test_partial_accumulation_window_flushed(self, conf, tmp_path_factory):
        import jax

        ckpt = str(tmp_path_factory.mktemp("ckpt"))
        # accumulate=2, signal before batch 3: one mini-step sits in the
        # buffer when the interrupt lands -> flush must close the window.
        _, trainer, _ = _fit_with_signal_at_batch(
            conf, ckpt, n=3, sig=signal.SIGTERM, accumulate_grad_batches=2
        )
        assert int(jax.device_get(trainer.state.opt_state.mini_step)) == 0
        # Flush rounded global_step up to the window boundary.
        assert trainer.global_step == 4
        assert os.path.isdir(os.path.join(ckpt, "interrupt"))

    def test_disabled_installs_nothing(self, conf, tmp_path_factory):
        ckpt = str(tmp_path_factory.mktemp("ckpt"))
        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=1, checkpoint_dir=ckpt, warmup_steps=0,
            save_on_interrupt=False,
        )
        assert trainer._install_interrupt_handlers() == {}
        trainer.fit(model)
        assert not os.path.isdir(os.path.join(ckpt, "interrupt"))
