"""Anchor-to-ground-truth matching with an ignore band, mask-based and batched.

TPU-native rebuild of the reference matcher (``retinanet/box_utils.py:51-80``):
for each anchor take the max IoU over the ground-truth boxes; IoU < bg_thr =>
background (-1); IoU > fg_thr => matched to that GT's index; in between =>
ignore (-2). With zero ground-truth boxes every anchor is ignored (-2) — the
reference's early-return at box_utils.py:70-71 — so empty images contribute no
loss (they are also filtered from COCO train by the reference,
utils/coco/coco_utils.py:104-141).

Differences from the reference, all shape-related not semantic:
  * GT comes padded to a static ``[N, 4]`` with a validity mask instead of a
    ragged tensor; padding rows can never win a match (their IoU is forced to -1).
  * The whole batch matches in one fused call (``match_anchors_batch``) instead
    of a per-image python loop (reference losses.py:126-135).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import IOU_THRESHOLDS_BACKGROUND, IOU_THRESHOLDS_FOREGROUND
from .boxes import box_iou

Array = jnp.ndarray

BACKGROUND = -1
IGNORE = -2


class MatchResult(NamedTuple):
    """Fixed-shape match outcome for one image (or a batch, with vmap).

    Attributes:
      matches: [A] int32 — GT index (>=0), BACKGROUND (-1) or IGNORE (-2).
      max_iou: [A] float — best IoU each anchor achieved over valid GT.
    """

    matches: Array
    max_iou: Array


def match_anchors(
    anchors: Array,
    gt_boxes: Array,
    gt_valid: Array,
    fg_iou_thr: float = IOU_THRESHOLDS_FOREGROUND,
    bg_iou_thr: float = IOU_THRESHOLDS_BACKGROUND,
) -> MatchResult:
    """Match ``[A, 4]`` anchors against padded ``[N, 4]`` GT boxes.

    Args:
      anchors: [A, 4] XYXY.
      gt_boxes: [N, 4] XYXY, padded; rows where ``gt_valid`` is False are inert.
      gt_valid: [N] bool mask of real GT rows.
      fg_iou_thr: strictly-greater-than foreground threshold (reference uses
        strict ``>`` at box_utils.py:79).
      bg_iou_thr: strictly-less-than background threshold (box_utils.py:78).
    """
    gt_valid = gt_valid.astype(bool)
    iou = box_iou(gt_boxes, anchors)  # [N, A]
    # Invalid GT rows must lose every argmax: force their IoU below any real value.
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    best_iou = jnp.max(iou, axis=0)  # [A]
    best_idx = jnp.argmax(iou, axis=0).astype(jnp.int32)  # [A]

    matches = jnp.full(anchors.shape[:-1], IGNORE, dtype=jnp.int32)
    matches = jnp.where(best_iou < bg_iou_thr, BACKGROUND, matches)
    matches = jnp.where(best_iou > fg_iou_thr, best_idx, matches)

    # Zero valid GT => all anchors ignored (reference box_utils.py:70-71).
    any_gt = jnp.any(gt_valid)
    matches = jnp.where(any_gt, matches, IGNORE)
    best_iou = jnp.where(any_gt, jnp.maximum(best_iou, 0.0), 0.0)
    return MatchResult(matches=matches, max_iou=best_iou)


def match_anchors_batch(
    anchors: Array,
    gt_boxes: Array,
    gt_valid: Array,
    fg_iou_thr: float = IOU_THRESHOLDS_FOREGROUND,
    bg_iou_thr: float = IOU_THRESHOLDS_BACKGROUND,
) -> MatchResult:
    """Batched matcher: anchors [A, 4] shared across the batch, GT [B, N, 4]."""
    return jax.vmap(
        lambda b, v: match_anchors(anchors, b, v, fg_iou_thr, bg_iou_thr)
    )(gt_boxes, gt_valid)
