"""Torch oracle of the reference's inference semantics (torchvision-free).

A from-scratch torch implementation of the reference RetinaNet postprocess
pipeline, used ONLY as a golden oracle for parity tests/reports — it mirrors
the *semantics* of `/root/reference/retinanet/models.py:160-243`
(``process_detections``) and `/root/reference/retinanet/box_utils.py:25-48`
(box coding), with dynamic shapes and per-class loops exactly like torch code
naturally writes them, so the framework's fused static-shape TPU path can be
checked against an independent implementation.

Decode semantics note (SURVEY.md §6): the reference's ``activ_2_bbox`` has a
slicing bug (box_utils.py:46 reads sizes from ``activations[..., :2]``), so
bit-parity with the reference's *predict* and correctness diverge. Like the
framework, this oracle implements the decode that inverts the reference's
training-time encoder ``bbox_2_activ`` (box_utils.py:25-34) — the behavior a
correctly-trained model needs — and the deviation is documented in PARITY.md.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import torch


def encode_boxes_torch(
    gt: torch.Tensor, anchors: torch.Tensor, weights=(1.0, 1.0, 1.0, 1.0)
) -> torch.Tensor:
    """GT xyxy → regression targets on anchors (reference bbox_2_activ,
    box_utils.py:25-34, including the +1e-8 inside the log)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    gw = gt[:, 2] - gt[:, 0]
    gh = gt[:, 3] - gt[:, 1]
    gcx = gt[:, 0] + 0.5 * gw
    gcy = gt[:, 1] + 0.5 * gh
    wx, wy, ww, wh = weights
    return torch.stack(
        [
            wx * (gcx - acx) / aw,
            wy * (gcy - acy) / ah,
            ww * torch.log(gw / aw + 1e-8),
            wh * torch.log(gh / ah + 1e-8),
        ],
        dim=1,
    )


def decode_boxes_torch(
    deltas: torch.Tensor, anchors: torch.Tensor, weights=(1.0, 1.0, 1.0, 1.0)
) -> torch.Tensor:
    """Regression activations → xyxy boxes: exact inverse of
    :func:`encode_boxes_torch` (the correct decode; see module docstring)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    wx, wy, ww, wh = weights
    cx = deltas[:, 0] / wx * aw + acx
    cy = deltas[:, 1] / wy * ah + acy
    w = torch.exp(deltas[:, 2] / ww) * aw
    h = torch.exp(deltas[:, 3] / wh) * ah
    return torch.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], dim=1
    )


def nms_torch(boxes: torch.Tensor, scores: torch.Tensor, iou_thr: float) -> torch.Tensor:
    """Sequential greedy hard NMS (torchvision::nms semantics: strict `>`
    suppression, score-descending order, stable ties)."""
    order = torch.argsort(scores, descending=True, stable=True)
    keep: List[int] = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (
        boxes[:, 3] - boxes[:, 1]
    ).clamp(min=0)
    for oi in order.tolist():
        if suppressed[oi]:
            continue
        keep.append(oi)
        lt = torch.maximum(boxes[oi, :2], boxes[:, :2])
        rb = torch.minimum(boxes[oi, 2:], boxes[:, 2:])
        inter = (rb - lt).clamp(min=0).prod(dim=1)
        union = areas[oi] + areas - inter
        iou = torch.where(union > 0, inter / union, torch.zeros_like(union))
        suppressed |= iou > iou_thr
    return torch.as_tensor(keep, dtype=torch.long)


def process_detections_torch(
    cls_logits: torch.Tensor,   # [A, C]
    box_deltas: torch.Tensor,   # [A, 4]
    anchors: torch.Tensor,      # [A, 4]
    image_size: Sequence[float],  # (h, w) of the resized, unpadded image
    score_thres: float = 0.05,
    nms_thres: float = 0.5,
    max_detections: int = 100,
    min_side: float = 1e-2,
) -> Dict[str, torch.Tensor]:
    """Reference ``process_detections`` semantics for ONE image
    (models.py:160-243): sigmoid → decode → clip → per-class
    [score>thr → remove-small → NMS] → concat → labels+1 → sort → top-k."""
    scores_all = torch.sigmoid(cls_logits.float())          # models.py:170
    boxes_all = decode_boxes_torch(box_deltas.float(), anchors.float())
    h, w = float(image_size[0]), float(image_size[1])
    boxes_all = torch.stack(
        [
            boxes_all[:, 0].clamp(0, w),
            boxes_all[:, 1].clamp(0, h),
            boxes_all[:, 2].clamp(0, w),
            boxes_all[:, 3].clamp(0, h),
        ],
        dim=1,
    )                                                       # models.py:189

    out_boxes, out_scores, out_labels = [], [], []
    for c in range(scores_all.shape[1]):                    # models.py:193
        sc = scores_all[:, c]
        m = sc > score_thres
        if not m.any():
            continue
        b, s = boxes_all[m], sc[m]
        big = ((b[:, 2] - b[:, 0]) >= min_side) & (
            (b[:, 3] - b[:, 1]) >= min_side
        )                                                   # models.py:203
        b, s = b[big], s[big]
        if len(b) == 0:
            continue
        kept = nms_torch(b, s, nms_thres)                   # models.py:210
        out_boxes.append(b[kept])
        out_scores.append(s[kept])
        out_labels.append(torch.full((len(kept),), c + 1, dtype=torch.long))

    if not out_boxes:
        return {
            "boxes": torch.zeros(0, 4),
            "scores": torch.zeros(0),
            "labels": torch.zeros(0, dtype=torch.long),
        }
    boxes = torch.cat(out_boxes)
    scores = torch.cat(out_scores)
    labels = torch.cat(out_labels)                          # models.py:222-230
    order = torch.argsort(scores, descending=True, stable=True)
    order = order[:max_detections]                          # models.py:240
    return {"boxes": boxes[order], "scores": scores[order], "labels": labels[order]}


# --------------------------------------------------------------------------- #
# Torch FPN + head oracle (whole-model logits parity)
# --------------------------------------------------------------------------- #
# Independent torch modules mirroring the reference FPN
# (`/root/reference/retinanet/layers.py:12-64`) and head (`layers.py:67-260`),
# with the SAME state_dict key schema as a reference-trained checkpoint —
# `fpn.conv_c{3,4,5}_{1x1,3x3}`, `fpn.conv_c{6,7}_3x3`,
# `retinanet_head.{classification,regression}_head.*` — so the full-detector
# converter (models/converter.py torch_retinanet_to_flax) can be driven through
# them and the flax model's cls/box logits cross-checked end-to-end against an
# implementation that shares no code with the framework.

import torch.nn as _nn
import torch.nn.functional as _F


class FPNOracle(_nn.Module):
    """P3-P7 pyramid from (C3, C4, C5); key schema of reference layers.py:18-32."""

    def __init__(self, c3: int, c4: int, c5: int, out: int = 256):
        super().__init__()
        self.conv_c3_1x1 = _nn.Conv2d(c3, out, 1)
        self.conv_c3_3x3 = _nn.Conv2d(out, out, 3, padding=1)
        self.conv_c4_1x1 = _nn.Conv2d(c4, out, 1)
        self.conv_c4_3x3 = _nn.Conv2d(out, out, 3, padding=1)
        self.conv_c5_1x1 = _nn.Conv2d(c5, out, 1)
        self.conv_c5_3x3 = _nn.Conv2d(out, out, 3, padding=1)
        self.conv_c6_3x3 = _nn.Conv2d(c5, out, 3, stride=2, padding=1)
        self.conv_c7_3x3 = _nn.Conv2d(out, out, 3, stride=2, padding=1)

    def forward(self, c3, c4, c5):
        m5 = self.conv_c5_1x1(c5)
        m4 = self.conv_c4_1x1(c4) + _F.interpolate(m5, scale_factor=2, mode="nearest")
        m3 = self.conv_c3_1x1(c3) + _F.interpolate(m4, scale_factor=2, mode="nearest")
        p6 = self.conv_c6_3x3(c5)
        return [
            self.conv_c3_3x3(m3),
            self.conv_c4_3x3(m4),
            self.conv_c5_3x3(m5),
            p6,
            self.conv_c7_3x3(_F.relu(p6)),
        ]


class _ClsHeadOracle(_nn.Module):
    """Key schema of reference RetinaNetClassSubnet (layers.py:118-196)."""

    def __init__(self, channels: int, num_anchors: int, num_classes: int):
        super().__init__()
        self.num_classes = num_classes
        layers = []
        for _ in range(4):
            layers += [_nn.Conv2d(channels, channels, 3, padding=1), _nn.ReLU()]
        self.class_subnet = _nn.Sequential(*layers)
        self.class_subnet_output = _nn.Conv2d(
            channels, num_anchors * num_classes, 3, padding=1
        )

    def forward(self, pyramid):
        rows = []
        for feat in pyramid:
            x = self.class_subnet_output(self.class_subnet(feat))
            n, _, h, w = x.shape
            # [N, A*K, H, W] -> [N, H*W*A, K]: channel = a*K + k (layers.py:189-195)
            x = x.view(n, -1, self.num_classes, h, w).permute(0, 3, 4, 1, 2)
            rows.append(x.reshape(n, -1, self.num_classes))
        return torch.cat(rows, dim=1)


class _BoxHeadOracle(_nn.Module):
    """Key schema of reference RetinaNetBoxSubnet (layers.py:199-260)."""

    def __init__(self, channels: int, num_anchors: int):
        super().__init__()
        layers = []
        for _ in range(4):
            layers += [_nn.Conv2d(channels, channels, 3, padding=1), _nn.ReLU()]
        self.box_subnet = _nn.Sequential(*layers)
        self.box_subnet_output = _nn.Conv2d(channels, num_anchors * 4, 3, padding=1)

    def forward(self, pyramid):
        rows = []
        for feat in pyramid:
            x = self.box_subnet_output(self.box_subnet(feat))
            n, _, h, w = x.shape
            x = x.view(n, -1, 4, h, w).permute(0, 3, 4, 1, 2)
            rows.append(x.reshape(n, -1, 4))
        return torch.cat(rows, dim=1)


class HeadOracle(_nn.Module):
    """Key schema of reference RetinaNetHead (layers.py:67-115)."""

    def __init__(self, channels: int, num_anchors: int, num_classes: int):
        super().__init__()
        self.classification_head = _ClsHeadOracle(channels, num_anchors, num_classes)
        self.regression_head = _BoxHeadOracle(channels, num_anchors)

    def forward(self, pyramid):
        return self.classification_head(pyramid), self.regression_head(pyramid)


class DetectorOracle(_nn.Module):
    """Full reference-schema detector: backbone.backbone + fpn + retinanet_head.

    `backbone_net` is any torch module returning (C3, C4, C5); it is wrapped so
    its weights land under `backbone.backbone.*` exactly like the reference's
    BackBone wrapper (reference backbone.py:340-360, models.py:117).
    state_dict() of this module IS a reference-trained-checkpoint schema.
    """

    def __init__(self, backbone_net, fpn_sizes, num_anchors: int, num_classes: int):
        super().__init__()
        wrapper = _nn.Module()
        wrapper.backbone = backbone_net
        self.backbone = wrapper
        self.fpn = FPNOracle(*fpn_sizes)
        self.retinanet_head = HeadOracle(256, num_anchors, num_classes)

    def forward(self, images_nchw):
        c3, c4, c5 = self.backbone.backbone(images_nchw)
        pyramid = self.fpn(c3, c4, c5)
        return self.retinanet_head(pyramid)
