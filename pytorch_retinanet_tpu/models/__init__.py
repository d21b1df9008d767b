"""Flax model stack: ResNet backbones, FPN, RetinaNet head, full detector."""

from ..ops.anchors import generate_anchors as _generate_anchors
from .backbone import (
    BACKBONE_OUT_CHANNELS,
    RESNET_SPECS,
    BasicBlock,
    Bottleneck,
    ResNetBackbone,
    backbone_out_channels,
)
from .converter import load_torch_resnet, torch_resnet_to_flax
from .zoo import MODEL_URLS, fetch_backbone_weights
from .fpn import FeaturePyramid
from .head import RetinaNetHead
from .retinanet import (
    Retinanet,
    RetinaNetModule,
    resize_to_bucket,
    resolution_buckets,
)


class AnchorGenerator:
    """Reference-parity anchor generator facade (reference retinanet/anchors.py:55).

    The TPU build computes anchors as a pure function of the static padded
    image size (see :func:`..ops.generate_anchors`); this class keeps the
    reference's exported name/constructor surface for users who build anchors
    directly.
    """

    def __init__(self, sizes=None, aspect_ratios=None, strides=None, offset=None):
        from .. import config as C

        self.sizes = tuple(tuple(s) for s in (sizes or C.ANCHOR_SIZES))
        self.aspect_ratios = tuple(aspect_ratios or C.ANCHOR_ASPECT_RATIOS)
        self.strides = tuple(strides or C.ANCHOR_STRIDES)
        self.offset = C.ANCHOR_OFFSET if offset is None else offset

    def __call__(self, image_size):
        """[A_total, 4] float32 XYXY anchors for a padded (H, W)."""
        return _generate_anchors(
            tuple(image_size),
            sizes=self.sizes,
            aspect_ratios=self.aspect_ratios,
            strides=self.strides,
            offset=self.offset,
        )


__all__ = [
    "AnchorGenerator",
    "BACKBONE_OUT_CHANNELS",
    "BasicBlock",
    "Bottleneck",
    "FeaturePyramid",
    "RESNET_SPECS",
    "ResNetBackbone",
    "Retinanet",
    "RetinaNetHead",
    "RetinaNetModule",
    "backbone_out_channels",
    "MODEL_URLS",
    "fetch_backbone_weights",
    "load_torch_resnet",
    "resize_to_bucket",
    "resolution_buckets",
    "torch_resnet_to_flax",
]
