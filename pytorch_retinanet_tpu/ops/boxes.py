"""Pure, fixed-shape box math (TPU-native replacement for torch box utilities).

Replaces the reference's ``retinanet/box_utils.py`` and the torchvision ops it
delegates to (``box_iou``, ``clip_boxes_to_image``, ``remove_small_boxes``).
Every function here is shape-polymorphic over leading batch dims, `vmap`-able,
and free of data-dependent control flow so it compiles to a single XLA program.

Boxes are ``[..., 4]`` float arrays in XYXY (x1, y1, x2, y2) unless noted.

Known reference deviations (deliberate, documented):
  * ``decode_boxes`` implements the *correct* inverse of ``encode_boxes``.
    The reference's ``activ_2_bbox`` (retinanet/box_utils.py:46) mistakenly uses
    the center deltas ``activations[..., :2]`` for the sizes and also mutates its
    input in-place (``:43``). We match the training-time encoder
    (retinanet/box_utils.py:25-34) instead, which is the published RetinaNet
    parameterization.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

Array = jnp.ndarray

# Matches the reference's epsilon inside the size log (retinanet/box_utils.py:32).
_ENCODE_EPS = 1e-8


def xyxy_to_cxcywh(boxes: Array) -> Array:
    """XYXY corners -> (cx, cy, w, h) (reference: convert_xywh, box_utils.py:11-15)."""
    lo, hi = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([(lo + hi) * 0.5, hi - lo], axis=-1)


def cxcywh_to_xyxy(boxes: Array) -> Array:
    """(cx, cy, w, h) -> XYXY corners (reference: convert_x1y1x2y2, box_utils.py:18-22)."""
    c, s = boxes[..., :2], boxes[..., 2:]
    half = s * 0.5
    return jnp.concatenate([c - half, c + half], axis=-1)


def encode_boxes(
    boxes: Array, anchors: Array, weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
) -> Array:
    """GT boxes -> regression targets on `anchors`.

    deltas = [(cx_gt - cx_a)/w_a, (cy_gt - cy_a)/h_a, log(w_gt/w_a), log(h_gt/h_a)]
    scaled elementwise by `weights` (reference: bbox_2_activ, box_utils.py:25-34,
    including the +1e-8 stabilizer inside the log).
    """
    b, a = xyxy_to_cxcywh(boxes), xyxy_to_cxcywh(anchors)
    t_centers = (b[..., :2] - a[..., :2]) / a[..., 2:]
    t_sizes = jnp.log(b[..., 2:] / a[..., 2:] + _ENCODE_EPS)
    w = jnp.asarray(weights, dtype=boxes.dtype)
    return jnp.concatenate([t_centers, t_sizes], axis=-1) * w


def decode_boxes(
    deltas: Array,
    anchors: Array,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    clip_size_log: float = 6.0,
) -> Array:
    """Regression activations -> XYXY boxes (correct inverse of :func:`encode_boxes`).

    Replaces the reference's activ_2_bbox (box_utils.py:37-48); see module
    docstring for the documented deviation. `clip_size_log` bounds exp() inputs so
    early-training garbage cannot produce inf boxes (same guard torchvision applies
    via ``bbox_xform_clip``).
    """
    a = xyxy_to_cxcywh(anchors)
    w = jnp.asarray(weights, dtype=deltas.dtype)
    d = deltas / w
    centers = a[..., 2:] * d[..., :2] + a[..., :2]
    size_log = jnp.clip(d[..., 2:], -clip_size_log, clip_size_log)
    sizes = a[..., 2:] * jnp.exp(size_log)
    return cxcywh_to_xyxy(jnp.concatenate([centers, sizes], axis=-1))


def box_area(boxes: Array) -> Array:
    """Area of XYXY boxes, clamped at zero for degenerate corners."""
    wh = jnp.maximum(boxes[..., 2:] - boxes[..., :2], 0.0)
    return wh[..., 0] * wh[..., 1]


def box_iou(boxes_a: Array, boxes_b: Array) -> Array:
    """Pairwise IoU: [..., N, 4] x [..., M, 4] -> [..., N, M].

    Vectorized replacement for torchvision.ops.boxes.box_iou used by the matcher
    (reference: box_utils.py:74). All-zero padding boxes produce IoU 0.
    """
    lo = jnp.maximum(boxes_a[..., :, None, :2], boxes_b[..., None, :, :2])
    hi = jnp.minimum(boxes_a[..., :, None, 2:], boxes_b[..., None, :, 2:])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    union = box_area(boxes_a)[..., :, None] + box_area(boxes_b)[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def clip_boxes(boxes: Array, image_size: Tuple[int, int] | Array) -> Array:
    """Clamp XYXY boxes into [0, W] x [0, H].

    `image_size` is (height, width) — replacement for
    torchvision.ops.clip_boxes_to_image (used at reference models.py:189).
    Accepts a traced array so per-image sizes work under vmap.
    """
    if isinstance(image_size, (tuple, list)):
        h, w = float(image_size[0]), float(image_size[1])
    else:
        image_size = jnp.asarray(image_size, dtype=boxes.dtype)
        h, w = image_size[..., 0], image_size[..., 1]
    x = jnp.clip(boxes[..., 0::2], 0.0, w)
    y = jnp.clip(boxes[..., 1::2], 0.0, h)
    return jnp.stack(
        [x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1
    ).astype(boxes.dtype)


def small_box_mask(boxes: Array, min_size: float = 1e-2) -> Array:
    """True where both sides >= min_size.

    Mask-based replacement for torchvision.ops.remove_small_boxes (reference
    models.py:203): instead of dynamically filtering (dynamic shapes), callers
    AND this into their validity mask.
    """
    wh = boxes[..., 2:] - boxes[..., :2]
    return jnp.all(wh >= min_size, axis=-1)


def rescale_boxes(boxes: Array, from_size: Array, to_size: Array) -> Array:
    """Rescale XYXY boxes from one image size to another.

    Replacement for GeneralizedRCNNTransform.postprocess's box rescaling
    (used at reference models.py:271). Sizes are (height, width) arrays so this
    stays traceable per-image under vmap.
    """
    from_size = jnp.asarray(from_size, dtype=boxes.dtype)
    to_size = jnp.asarray(to_size, dtype=boxes.dtype)
    scale_y = to_size[..., 0] / from_size[..., 0]
    scale_x = to_size[..., 1] / from_size[..., 1]
    scale = jnp.stack([scale_x, scale_y, scale_x, scale_y], axis=-1)
    return boxes * scale
