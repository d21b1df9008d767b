"""Configuration system.

The reference configures everything through OmegaConf YAML files
(``/root/reference/hparams.yaml``, consumed at ``/root/reference/model.py:27-31``)
plus module-level default constants (``/root/reference/retinanet/config.py:12-87``).

This module provides the same two tiers, TPU-framework-native:

* :class:`ConfigDict` — an attribute-style nested dict with an OmegaConf-compatible
  surface (``conf.model.backbone_kind``), so existing ``hparams.yaml`` files keep
  working unchanged.
* :class:`OmegaConf` — a tiny shim exposing ``OmegaConf.load`` / ``OmegaConf.create``
  so reference-style user code (``OmegaConf.load("hparams.yaml")``) ports verbatim.
* Module constants mirroring the reference defaults (``retinanet/config.py:12-87``),
  applied through :func:`ifnone` (``retinanet/utilities.py:4-9``).
"""

from __future__ import annotations

import copy
from typing import Any, Iterator, List, Mapping, Optional

import yaml

# ----------------------------------------------------------------------------- #
# INPUT  (reference: retinanet/config.py:12-18)
# ----------------------------------------------------------------------------- #
MEAN: List[float] = [0.485, 0.456, 0.406]
STD: List[float] = [0.229, 0.224, 0.225]
MIN_IMAGE_SIZE: int = 800
MAX_IMAGE_SIZE: int = 1333

# ----------------------------------------------------------------------------- #
# Anchor generator defaults (reference: retinanet/config.py:27-42)
# ----------------------------------------------------------------------------- #
ANCHOR_SIZES: List[List[float]] = [
    [x, x * 2 ** (1 / 3), x * 2 ** (2 / 3)] for x in [32, 64, 128, 256, 512]
]
ANCHOR_STRIDES: List[int] = [8, 16, 32, 64, 128]
ANCHOR_ASPECT_RATIOS: List[float] = [0.5, 1.0, 2.0]
ANCHOR_OFFSET: float = 0.0

# ----------------------------------------------------------------------------- #
# RetinaNet head defaults (reference: retinanet/config.py:48-87)
# ----------------------------------------------------------------------------- #
NUM_CLASSES: int = 90
BACKBONE: str = "resnet50"
PRETRAINED_BACKBONE: bool = True
PRIOR: float = 0.01
FREEZE_BN: bool = True
BBOX_REG_WEIGHTS: List[float] = [1.0, 1.0, 1.0, 1.0]
SCORE_THRES: float = 0.05
NMS_THRES: float = 0.5
MAX_DETECTIONS_PER_IMAGE: int = 100
IOU_THRESHOLDS_FOREGROUND: float = 0.5
IOU_THRESHOLDS_BACKGROUND: float = 0.4
FOCAL_LOSS_GAMMA: float = 2.0
FOCAL_LOSS_ALPHA: float = 0.25
SMOOTH_L1_LOSS_BETA: float = 0.1

# ----------------------------------------------------------------------------- #
# TPU-specific defaults (no reference equivalent — static-shape requirements)
# ----------------------------------------------------------------------------- #
# Maximum number of ground-truth boxes per image after padding. Ragged targets
# (reference collates them as python lists, utils/detection_utils.py:7-9) become
# fixed-shape [B, MAX_GT_BOXES, 4] arrays with a validity mask.
MAX_GT_BOXES: int = 100
# Candidates kept per image before NMS (flattened over anchors x classes).
PRE_NMS_TOP_K: int = 1000
# Compute dtype for the conv trunk. Params stay fp32.
COMPUTE_DTYPE: str = "bfloat16"


def ifnone(a: Any, b: Any) -> Any:
    """`a` if `a` is not None, otherwise `b` (reference: retinanet/utilities.py:4-9)."""
    return b if a is None else a


class ConfigDict(dict):
    """Attribute-style nested dict (OmegaConf DictConfig surface).

    Missing keys read as ``None`` rather than raising, matching how the reference
    treats optional config sections (e.g. ``conf.scheduler.monitor`` tested for
    falsiness at ``/root/reference/model.py:85-90``).
    """

    def __init__(self, data: Optional[Mapping] = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, ConfigDict):
            return value
        if isinstance(value, Mapping):
            return ConfigDict(value)
        if isinstance(value, (list, tuple)):
            return [ConfigDict._wrap(v) for v in value]
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, self._wrap(value))

    def __getattr__(self, key: str) -> Any:
        if key.startswith("__"):
            raise AttributeError(key)
        return self.get(key)

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __delattr__(self, key: str) -> None:
        if key in self:
            del self[key]

    def __deepcopy__(self, memo) -> "ConfigDict":
        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, ConfigDict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)

    def merge(self, other: Mapping) -> "ConfigDict":
        """Deep-merge `other` into a copy of self (other wins)."""
        out = copy.deepcopy(self)
        for k, v in other.items():
            if isinstance(v, Mapping) and isinstance(out.get(k), ConfigDict):
                out[k] = out[k].merge(v)
            else:
                out[k] = v
        return out


class OmegaConf:
    """Minimal OmegaConf-compatible loader so reference user code ports verbatim.

    Supports the subset the reference exercises: ``OmegaConf.load`` (README.md:43),
    ``OmegaConf.create``, ``OmegaConf.merge``, ``OmegaConf.to_container``.
    """

    @staticmethod
    def load(path: str) -> ConfigDict:
        with open(path) as f:
            return ConfigDict(yaml.safe_load(f) or {})

    @staticmethod
    def create(data: Optional[Mapping] = None) -> ConfigDict:
        if isinstance(data, str):
            return ConfigDict(yaml.safe_load(data) or {})
        return ConfigDict(data or {})

    @staticmethod
    def merge(*configs: Mapping) -> ConfigDict:
        out = ConfigDict()
        for c in configs:
            out = out.merge(c)
        return out

    @staticmethod
    def to_container(conf: ConfigDict) -> dict:
        return conf.to_dict()

    @staticmethod
    def to_yaml(conf: ConfigDict) -> str:
        return yaml.safe_dump(conf.to_dict(), sort_keys=False)


def load_config(path: str) -> ConfigDict:
    """Load a YAML config file into a :class:`ConfigDict`."""
    return OmegaConf.load(path)


def default_hparams() -> ConfigDict:
    """Built-in equivalent of the reference's ``hparams.yaml`` top-level sections."""
    return ConfigDict(
        {
            "model": {
                "backbone_kind": BACKBONE,
                "num_classes": NUM_CLASSES,
                "freeze_bn": FREEZE_BN,
                "min_size": MIN_IMAGE_SIZE,
                "max_size": MAX_IMAGE_SIZE,
                "pretrained": False,
            },
            "dataset": {
                "kind": False,
                "root_dir": False,
                "trn_paths": False,
                "valid_paths": False,
                "test_paths": False,
            },
            "dataloader": {
                "train_bs": 2,
                "valid_bs": 8,
                "test_bs": 8,
                "args": {"num_workers": 0},
            },
            "transforms": [
                {"class_name": "albumentations.HorizontalFlip", "params": {"p": 0.5}}
            ],
            "optimizer": {
                "class_name": "torch.optim.SGD",
                "params": {"lr": 0.001, "weight_decay": 0.001, "momentum": 0.9},
            },
            "scheduler": {
                "class_name": None,
                "params": {},
                "interval": "epoch",
                "frequency": 1,
                "monitor": False,
            },
        }
    )
