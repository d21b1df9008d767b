"""Pure, fixed-shape detection ops (box math, anchors, matching, losses, NMS)."""

from .anchors import (
    feature_grid_sizes,
    generate_anchors,
    generate_anchors_per_level,
    generate_cell_anchors,
    num_anchors_per_location,
)
from .boxes import (
    box_area,
    box_iou,
    clip_boxes,
    cxcywh_to_xyxy,
    decode_boxes,
    encode_boxes,
    rescale_boxes,
    small_box_mask,
    xyxy_to_cxcywh,
)
from .losses import (
    retinanet_loss,
    retinanet_loss_levels,
    sigmoid_focal_loss,
    smooth_l1_loss,
)
from .matcher import BACKGROUND, IGNORE, MatchResult, match_anchors, match_anchors_batch
from .nms import (
    Detections,
    nms_keep_mask,
    pack_detections,
    process_detections,
    process_detections_batch,
    process_detections_multilevel,
    process_detections_multilevel_batch,
    unpack_detections,
)

__all__ = [
    "BACKGROUND",
    "Detections",
    "IGNORE",
    "MatchResult",
    "box_area",
    "box_iou",
    "clip_boxes",
    "cxcywh_to_xyxy",
    "decode_boxes",
    "encode_boxes",
    "feature_grid_sizes",
    "generate_anchors",
    "generate_anchors_per_level",
    "generate_cell_anchors",
    "match_anchors",
    "match_anchors_batch",
    "nms_keep_mask",
    "pack_detections",
    "num_anchors_per_location",
    "process_detections",
    "process_detections_batch",
    "process_detections_multilevel",
    "process_detections_multilevel_batch",
    "rescale_boxes",
    "retinanet_loss",
    "unpack_detections",
    "retinanet_loss_levels",
    "sigmoid_focal_loss",
    "small_box_mask",
    "smooth_l1_loss",
    "xyxy_to_cxcywh",
]
