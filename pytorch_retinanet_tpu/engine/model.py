"""RetinaNetModel — the config-driven task module the Trainer consumes.

Parity rebuild of the reference's LightningModule (``model.py:18-147``): takes
an OmegaConf-style config, builds the detector, materializes datasets per
``dataset.kind ∈ {coco, pascal, csv}`` (reference ``prepare_data``,
model.py:37-74), exposes dataloaders (model.py:92-110) and the
optimizer/scheduler pair (``configure_optimizers``, model.py:76-90).

Unlike the reference, the step functions themselves live in the Trainer as one
jitted SPMD program (SURVEY.md §7.6) — this class supplies the pure pieces:
``loss_fn`` / ``predict_fn`` over explicit variables, so the trainer can
jit/donate them.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

from .. import config as C
from ..config import ConfigDict
from ..data.coco import CocoDetectionDataset, get_coco, get_coco_api_from_dataset
from ..data.loader import DetectionLoader
from ..data.pascal import PascalDataset, get_pascal
from ..data.transforms import build_transforms
from ..eval.coco_eval import CocoEvaluator
from ..models.retinanet import Retinanet
from .optim import LRScheduler, build_optimizer, build_scheduler

logger = logging.getLogger(__name__)


class RetinaNetModel:
    """Config-driven detection task (reference RetinaNetModel, model.py:18)."""

    def __init__(self, hparams: ConfigDict):
        self.hparams = hparams
        model_conf = dict(hparams.model or {})
        self.net = Retinanet(**model_conf)
        self.trn_ds = None
        self.val_ds = None
        self.test_ds = None

    # ------------------------------------------------------------------ #
    # Data (reference model.py:37-74)
    # ------------------------------------------------------------------ #
    def prepare_data(self) -> None:
        conf = self.hparams
        kind = (conf.dataset or {}).get("kind")
        if not kind:
            raise ValueError("hparams.dataset.kind must be one of coco/pascal/csv")
        # keep_bytes: a pure-geometric train chain (the default — just
        # HorizontalFlip, hparams.yaml:48-62) skips ToFloat and stays uint8
        # end-to-end; the loader's "auto" wire then ships raw bytes and the
        # device normalizes from them (4x less host prep + transfer,
        # LOADER.json). Any photometric transform keeps the float pipeline.
        trn_tfms = build_transforms(conf.transforms, keep_bytes=True)
        if kind == "coco":
            root = conf.dataset.root_dir
            self.trn_ds = get_coco(root, "train", trn_tfms)
            self.val_ds = get_coco(root, "val", build_transforms(None))
            self.test_ds = self.val_ds
        elif kind == "pascal":
            # trn/valid/test_paths are (annotation_dir, image_dir) pairs
            # (reference model.py:54-61).
            trn_paths = list(conf.dataset.trn_paths)
            self.trn_ds, _ = get_pascal(trn_paths[0], trn_paths[1], "train", trn_tfms)
            if conf.dataset.valid_paths:
                val_paths = list(conf.dataset.valid_paths)
                self.val_ds, _ = get_pascal(
                    val_paths[0], val_paths[1], "valid", build_transforms(None)
                )
            else:
                self.val_ds = None  # optional, like reference model.py:55-58
            test_paths = list(conf.dataset.test_paths)
            self.test_ds, _ = get_pascal(
                test_paths[0], test_paths[1], "test", build_transforms(None)
            )
        elif kind == "csv":
            self.trn_ds = PascalDataset(conf.dataset.trn_paths, trn_tfms)
            # Identity checks, not truthiness: valid_paths may be a DataFrame
            # (whose __bool__ raises), while the reference demo's "no
            # validation" spelling is `valid_paths: False` (demo.ipynb
            # hparams cell) and YAML configs may leave it null.
            vp = conf.dataset.valid_paths
            self.val_ds = (
                PascalDataset(vp, build_transforms(None))
                if vp is not None and vp is not False
                else None
            )
            # test_paths gets the same None/False handling as valid_paths: a
            # fit-only config must not need a test CSV (test_dataloader
            # raises a guided error if test() is then called).
            tp = conf.dataset.test_paths
            self.test_ds = (
                PascalDataset(tp, build_transforms(None))
                if tp is not None and tp is not False
                else None
            )
        else:
            raise ValueError(f"unknown dataset.kind {kind!r}")

    def _loader_args(self) -> Dict[str, Any]:
        args = dict((self.hparams.dataloader or {}).get("args") or {})
        out = {
            "min_size": self.net.min_size,
            "max_size": self.net.max_size,
            "num_workers": int(args.get("num_workers", 4) or 4),
            "prefetch": int(args.get("prefetch", 2) or 2),
        }
        if args.get("image_dtype"):
            # dataloader.args.image_dtype: uint8 ships raw bytes to the
            # device (normalize-from-bytes is in the traced graph) — 4x less
            # host pipeline memcpy and host→device transfer. Explicit config
            # overrides the "auto" default.
            import numpy as np

            dtype = str(args["image_dtype"])
            out["image_dtype"] = dtype if dtype == "auto" else np.dtype(dtype)
        else:
            # Default: wire dtype follows the transform chain — uint8 for
            # byte-preserving train pipelines (see keep_bytes above), float32
            # for float pipelines and for val/test (whose chains start with
            # ToFloat, so eval numerics are unchanged).
            out["image_dtype"] = "auto"
        return out

    def train_dataloader(self, shard: int = 0, num_shards: int = 1) -> DetectionLoader:
        if self.trn_ds is None:
            self.prepare_data()
        return DetectionLoader(
            self.trn_ds,
            int(self.hparams.dataloader.train_bs),
            shuffle=True,
            drop_last=True,
            shard=shard,
            num_shards=num_shards,
            **self._loader_args(),
        )

    def val_dataloader(
        self, shard: int = 0, num_shards: int = 1
    ) -> Optional[DetectionLoader]:
        if self.trn_ds is None:
            self.prepare_data()
        if self.val_ds is None:  # optional validation set (reference model.py:100-103)
            return None
        return DetectionLoader(
            self.val_ds,
            int(self.hparams.dataloader.valid_bs),
            shard=shard,
            num_shards=num_shards,
            **self._loader_args(),
        )

    def test_dataloader(self, shard: int = 0, num_shards: int = 1) -> DetectionLoader:
        if self.test_ds is None:
            self.prepare_data()
        if self.test_ds is None:
            raise ValueError(
                "no test dataset: set dataset.test_paths (csv/pascal kinds) "
                "before calling test()/test_dataloader()"
            )
        return DetectionLoader(
            self.test_ds,
            int(self.hparams.dataloader.test_bs),
            shard=shard,
            num_shards=num_shards,
            **self._loader_args(),
        )

    def test_evaluator(self, iou_types=("bbox",)) -> CocoEvaluator:
        """CocoEvaluator over the test dataset's COCO GT (reference
        test_dataloader building CocoEvaluator, model.py:105-110).
        ``iou_types`` ⊆ {"bbox", "segm", "keypoints"} — RetinaNet predicts
        boxes, so the trainer uses bbox; the wider surface serves user code."""
        if self.test_ds is None:
            self.prepare_data()
        if self.test_ds is None:
            raise ValueError(
                "no test dataset: set dataset.test_paths before building an "
                "evaluator"
            )
        return CocoEvaluator(get_coco_api_from_dataset(self.test_ds), list(iou_types))

    # ------------------------------------------------------------------ #
    # Optimization (reference model.py:76-90)
    # ------------------------------------------------------------------ #
    def configure_optimizers(self) -> Tuple[Any, LRScheduler, Dict[str, Any]]:
        opt_conf = self.hparams.optimizer or ConfigDict(
            {"class_name": "torch.optim.SGD", "params": {"lr": 1e-3}}
        )
        optimizer = build_optimizer(
            opt_conf.class_name,
            opt_conf.get("params"),
            # Opt-in leaf coalescing (optax.flatten): one raveled update
            # vector instead of ~160 per-leaf kernel chains. Changes the
            # optimizer-state pytree, so checkpoints only resume under the
            # same flag — which the config itself carries.
            flatten=bool(opt_conf.get("flatten") or False),
        )
        sched_conf = self.hparams.scheduler or ConfigDict({})
        base_lr = float((opt_conf.get("params") or {}).get("lr", 1e-3))
        scheduler = build_scheduler(
            sched_conf.get("class_name"), base_lr, sched_conf.get("params")
        )
        sched_meta = {
            "interval": sched_conf.get("interval") or "epoch",
            "frequency": int(sched_conf.get("frequency") or 1),
            "monitor": sched_conf.get("monitor") or None,
        }
        return optimizer, scheduler, sched_meta
