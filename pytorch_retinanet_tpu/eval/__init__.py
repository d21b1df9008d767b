"""Evaluation: self-contained COCO bbox mAP (pycocotools-compatible)."""

from .coco_eval import COCOeval, CocoEvaluator, Params, bbox_iou_xywh

__all__ = ["COCOeval", "CocoEvaluator", "Params", "bbox_iou_xywh"]
