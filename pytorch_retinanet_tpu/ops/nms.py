"""Static-shape on-device NMS and detection postprocessing.

Replaces the reference's inference postprocess (``retinanet/models.py:160-243``),
which loops in python per image and per class, calling torchvision's C++/CUDA
``nms`` once per class (models.py:210) with device round-trips for every boolean
index. Here the whole path — sigmoid, top-k candidate selection, box decode,
clip, class-aware NMS, final top-k — is one fused XLA computation with fixed
shapes, vmapped over the batch. Host transfer happens once, for the final padded
detections.

Algorithm notes:
  * Candidate pre-selection: top ``pre_nms_top_k`` scores over the flattened
    [A x C] score matrix (the reference NMS-es every anchor above 0.05 per class;
    torchvision's RetinaNet uses the same top-k trick — 1000 candidates — and the
    mAP impact is nil because NMS keeps <= 100 anyway). Deviation documented.
  * Class-aware NMS via the class-offset trick: boxes are translated by
    ``class_id * (max_coordinate + 1)`` so boxes of different classes never
    overlap, collapsing the reference's per-class python loop (models.py:193-219)
    into ONE suppression over the candidate set.
  * Greedy NMS as a fixpoint: keep[j] = valid[j] and no higher-scoring kept box
    overlaps it above the threshold. Iterating that map from keep=valid converges
    to exactly the sequential-greedy solution in (suppression-chain-depth)
    iterations — typically < 10 — each iteration a [K, K] mask reduction that the
    VPU eats whole. This keeps the op data-parallel instead of a K-step scan.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..config import (
    BBOX_REG_WEIGHTS,
    MAX_DETECTIONS_PER_IMAGE,
    NMS_THRES,
    PRE_NMS_TOP_K,
    SCORE_THRES,
)
from .boxes import box_iou, clip_boxes, decode_boxes, small_box_mask

Array = jnp.ndarray


def nms_keep_mask(
    boxes: Array,
    scores: Array,
    iou_threshold: float = NMS_THRES,
    valid: Array | None = None,
) -> Array:
    """Greedy hard-NMS keep mask over score-descending candidates.

    Args:
      boxes: [K, 4] XYXY, already sorted by score descending (ties broken by
        index, matching torch's stable sort).
      scores: [K] descending scores (only used to assert ordering semantics).
      iou_threshold: suppress j if IoU(i, j) > threshold for a kept i with i < j
        (strict >, matching torchvision::nms).
      valid: [K] bool — candidates to consider at all.

    Returns:
      [K] bool keep mask, identical to sequential greedy NMS.
    """
    k = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k,), dtype=bool)
    iou = box_iou(boxes, boxes)  # [K, K]
    idx = jnp.arange(k)
    # suppress[i, j]: i (higher score) can suppress j.
    suppress = (iou > iou_threshold) & (idx[:, None] < idx[None, :])
    suppress = suppress & valid[:, None] & valid[None, :]

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(suppress & keep[:, None], axis=0)  # [K]
        return valid & ~suppressed, keep, it + 1

    init = (valid, jnp.zeros_like(valid), jnp.int32(0))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


class Detections(NamedTuple):
    """Padded, fixed-shape detections for one image (or batch with leading dim).

    Matches the reference's per-image dict {"boxes", "scores", "labels"}
    (models.py:242) plus an explicit validity mask (the TPU substitute for the
    reference's dynamic-length outputs).
    """

    boxes: Array  # [..., D, 4] XYXY
    scores: Array  # [..., D]
    labels: Array  # [..., D] int32 in [1, num_classes]
    valid: Array  # [..., D] bool


def pack_detections(det: Detections) -> Array:
    """Pack a :class:`Detections` pytree into ONE ``[..., D, 6]`` f32 buffer
    (x1, y1, x2, y2, score, label — label 0 marks an invalid row).

    Serving fetches detections to the host every request; on a remote-
    dispatch transport each device buffer is its own round trip, so fetching
    the 4-array pytree costs ~4x the latency of this single packed buffer
    (measured in tools/bench_latency.py). :func:`unpack_detections` restores
    the pytree host-side. Labels are >= 1 for real detections (reference
    models.py:231 labels+1), so 0 is a safe invalid marker.
    """
    label = jnp.where(det.valid, det.labels, 0).astype(jnp.float32)
    return jnp.concatenate(
        [
            det.boxes.astype(jnp.float32),
            det.scores.astype(jnp.float32)[..., None],
            label[..., None],
        ],
        axis=-1,
    )


def unpack_detections(packed) -> Detections:
    """Host-side inverse of :func:`pack_detections` (numpy in/out)."""
    import numpy as np

    packed = np.asarray(packed)
    labels = packed[..., 5].astype(np.int32)
    return Detections(
        boxes=packed[..., :4],
        scores=packed[..., 4],
        labels=labels,
        valid=labels > 0,
    )


def _suppress_and_pack(
    boxes: Array,
    scores: Array,
    class_idx: Array,
    valid: Array,
    *,
    nms_thres: float,
    max_detections: int,
    max_coordinate: float,
    use_pallas: bool | None,
) -> Detections:
    """Shared tail of both postprocess paths: class-offset NMS over the
    candidate set, then final top-k packing into padded Detections."""
    offsets = class_idx.astype(jnp.float32) * (max_coordinate + 1.0)
    if use_pallas is None:
        from ..kernels import tpu_available

        use_pallas = tpu_available()
    if use_pallas:
        from ..kernels import pallas_nms_keep_mask

        keep = pallas_nms_keep_mask(boxes + offsets[:, None], valid, nms_thres)
    else:
        keep = nms_keep_mask(boxes + offsets[:, None], scores, nms_thres, valid)

    sel_scores = jnp.where(keep, scores, -1.0)
    det_scores, det_idx = jax.lax.top_k(sel_scores, max_detections)
    det_valid = det_scores > 0.0
    det_boxes = jnp.where(det_valid[:, None], boxes[det_idx], 0.0)
    det_labels = jnp.where(det_valid, class_idx[det_idx] + 1, 0)
    det_scores = jnp.maximum(det_scores, 0.0)
    return Detections(det_boxes, det_scores, det_labels, det_valid)


def process_detections(
    cls_logits: Array,
    box_deltas: Array,
    anchors: Array,
    image_size: Array,
    *,
    score_thres: float = SCORE_THRES,
    nms_thres: float = NMS_THRES,
    max_detections: int = MAX_DETECTIONS_PER_IMAGE,
    pre_nms_top_k: int = PRE_NMS_TOP_K,
    reg_weights: Sequence[float] = tuple(BBOX_REG_WEIGHTS),
    max_coordinate: float = 4096.0,
    use_pallas: bool | None = None,
) -> Detections:
    """Fused postprocess for ONE image (vmap for a batch).

    Args:
      cls_logits: [A, C] raw class logits.
      box_deltas: [A, 4] raw box activations.
      anchors: [A, 4] XYXY anchors.
      image_size: (2,) (height, width) of the *resized, unpadded* image — boxes
        are clipped to it (reference models.py:189 clips to im_sz).
      max_coordinate: static upper bound on any box coordinate, used for the
        class-offset translation. Must exceed the largest padded image side.

    Returns fixed-shape :class:`Detections` with `max_detections` slots; labels
    are shifted +1 (background=0 convention, reference models.py:230).
    """
    num_anchors, num_classes = cls_logits.shape
    k = min(pre_nms_top_k, num_anchors * num_classes)
    # numpy anchors must become a device constant before traced gather below
    anchors = jnp.asarray(anchors)

    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))  # [A, C]
    top_scores, top_idx = jax.lax.top_k(scores.reshape(-1), k)  # descending
    anchor_idx = top_idx // num_classes
    class_idx = (top_idx % num_classes).astype(jnp.int32)

    boxes = decode_boxes(
        box_deltas.astype(jnp.float32)[anchor_idx], anchors[anchor_idx], reg_weights
    )  # [k, 4]
    boxes = clip_boxes(boxes, image_size)

    valid = (top_scores > score_thres) & small_box_mask(boxes)  # models.py:196,203
    return _suppress_and_pack(
        boxes, top_scores, class_idx, valid,
        nms_thres=nms_thres, max_detections=max_detections,
        max_coordinate=max_coordinate, use_pallas=use_pallas,
    )


def process_detections_multilevel(
    cls_levels: Sequence[Array],
    box_levels: Sequence[Array],
    anchors_levels: Sequence[Array],
    image_size: Array,
    *,
    score_thres: float = SCORE_THRES,
    nms_thres: float = NMS_THRES,
    max_detections: int = MAX_DETECTIONS_PER_IMAGE,
    pre_nms_top_k: int = PRE_NMS_TOP_K,
    reg_weights: Sequence[float] = tuple(BBOX_REG_WEIGHTS),
    max_coordinate: float = 4096.0,
    use_pallas: bool | None = None,
    approx_top_k: bool = True,
) -> Detections:
    """Fused postprocess for ONE image from per-level head outputs.

    Performance-oriented variant of :func:`process_detections`: candidate
    selection runs per pyramid level BEFORE any cross-level concat (top-k over
    each level's [A_l*C] logits — sigmoid is monotonic so selecting on raw
    logits is identical), then the per-level candidates merge through one more
    top-k. This avoids materializing the [A_total, C] score matrix (~17M f32
    at 800px x 90 classes) that dominated the single-tensor path's HBM traffic.

    Candidate selection per level (approx mode, the production default):

    * **Large levels** (``A_l > 4k``): per-anchor TOP-2 classes via streaming
      max/argmax reductions (no materialized candidate rows), then one
      ``approx_max_k`` over the [A_l*2] (anchor, class-rank) pairs. This
      replaced a two-stage top-k-anchors → gather-rows → top-k-pairs scheme:
      the [k, C] row gather alone was ~6 ms/batch32 at 800px on v5e (random
      row DMA), and the top-2 restriction selects the same candidates — the
      only pairs it can drop are an anchor's 3rd+ classes, which must beat
      the rank-k cut to matter (measured ΔAP vs the exact reference
      selection: PARITY_REPORT.md). Measured: 15.0 ms → 9.8 ms for the
      batch-32 selection (tools/profile_post.py; the historical flat
      [A_l*C] sort this all replaces was 43% of END-TO-END inference).
    * **Small levels** (``A_l <= 4k``, P6/P7): selection runs directly on the
      full [A_l*C] pair space — cheap at that size, gather-free, and MORE
      faithful than any anchor-truncation (every class of every anchor
      competes, exactly like the reference's per-class thresholding).

    ``approx_top_k`` uses ``jax.lax.approx_max_k`` (TPU-native bucketed
    top-k, ~recall 0.95 at the rank-k margin); the mAP effect is measured
    (PARITY_REPORT.md) because only near-threshold candidates can be missed.
    Set False for the exact two-stage selection (top-k anchors by class-max,
    then exact top-k over the gathered [k, C] rows — any pair strictly above
    the k-th score survives stage 1 since its anchor's class-max bounds its
    own score; used for parity testing against the reference's exhaustive
    per-class thresholds).
    """
    scores_all, boxes_all, classes_all = multilevel_candidates(
        cls_levels, box_levels, anchors_levels,
        pre_nms_top_k=pre_nms_top_k, reg_weights=reg_weights,
        approx_top_k=approx_top_k,
    )
    boxes, top_scores, class_idx, valid = merge_candidates(
        scores_all, boxes_all, classes_all, image_size,
        pre_nms_top_k=pre_nms_top_k, score_thres=score_thres,
    )
    return _suppress_and_pack(
        boxes, top_scores, class_idx, valid,
        nms_thres=nms_thres, max_detections=max_detections,
        max_coordinate=max_coordinate, use_pallas=use_pallas,
    )


def multilevel_candidates(
    cls_levels: Sequence[Array],
    box_levels: Sequence[Array],
    anchors_levels: Sequence[Array],
    *,
    pre_nms_top_k: int = PRE_NMS_TOP_K,
    reg_weights: Sequence[float] = tuple(BBOX_REG_WEIGHTS),
    approx_top_k: bool = True,
):
    """Stage 1 of the multilevel postprocess: PER-LEVEL candidate selection
    + decode, before any cross-level merge. Split out so the roofline
    profiler can cut the full inference program here (DCE truncates the
    merge/NMS tail). Returns concatenated ([K] logits, [K, 4] boxes,
    [K] class indices) over all levels, K = sum of per-level k."""
    num_classes = cls_levels[0].shape[-1]
    cand_scores, cand_boxes, cand_classes = [], [], []
    for cls_l, box_l, anc_l in zip(cls_levels, box_levels, anchors_levels):
        # Anchors arrive as lru_cached numpy constants (ops/anchors.py); a
        # numpy array cannot be indexed by a traced sel_anchor — make it a
        # jnp constant here so callers can pass either form under jit.
        anc_l = jnp.asarray(anc_l)
        a_l = cls_l.shape[0]
        k_anchors = min(pre_nms_top_k, a_l)
        if not approx_top_k:
            # Exact mode: two-stage (top-k anchors by class-max → exact
            # top-k over the gathered [k, C] rows) for parity testing.
            anchor_max = jnp.max(cls_l, axis=-1)
            _, a_idx = jax.lax.top_k(anchor_max, k_anchors)
            rows = jnp.take(cls_l, a_idx, axis=0, unique_indices=True).astype(
                jnp.float32
            )
            flat = rows.reshape(-1)
            k_l = min(pre_nms_top_k, flat.shape[0])
            s_l, idx_l = jax.lax.top_k(flat, k_l)
            sel_anchor = a_idx[idx_l // num_classes]
            c_idx = (idx_l % num_classes).astype(jnp.int32)
        elif a_l > 4 * k_anchors:
            # Large level: approx top-k anchors by class-max (the class-max
            # fuses into the head's epilogue in the full pipeline), gather
            # the survivors' rows, approx top-k the (anchor, class) pairs.
            # A per-anchor-top-2 streaming variant measured 9.8 ms vs 15.0
            # STANDALONE at batch 32 but was 2 ms SLOWER end-to-end (its
            # extra argmax/mask passes re-read the [A_l, C] logits that the
            # fused class-max reads for free) — pipeline measurements win.
            anchor_max = jnp.max(cls_l, axis=-1)  # [A_l]
            _, a_idx = jax.lax.approx_max_k(anchor_max, k_anchors)
            # top-k indices are distinct — the hint picks a faster gather
            rows = jnp.take(cls_l, a_idx, axis=0, unique_indices=True).astype(
                jnp.float32
            )  # [k, C]
            flat = rows.reshape(-1)
            k_l = min(pre_nms_top_k, flat.shape[0])
            s_l, idx_l = jax.lax.approx_max_k(flat, k_l)
            sel_anchor = a_idx[idx_l // num_classes]
            c_idx = (idx_l % num_classes).astype(jnp.int32)
        else:
            # Small level (P6/P7): the full pair space fits — select
            # (anchor, class) directly, gather-free, no anchor truncation.
            flat = cls_l.reshape(-1)
            k_l = min(pre_nms_top_k, flat.shape[0])
            if flat.shape[0] > 4 * k_l:
                s_l, idx_l = jax.lax.approx_max_k(flat, k_l)
            else:
                s_l, idx_l = jax.lax.top_k(flat, k_l)
            s_l = s_l.astype(jnp.float32)
            sel_anchor = idx_l // num_classes
            c_idx = (idx_l % num_classes).astype(jnp.int32)
        b_l = decode_boxes(
            box_l.astype(jnp.float32)[sel_anchor],
            anc_l[sel_anchor],
            reg_weights,
        )
        cand_scores.append(s_l)
        cand_boxes.append(b_l)
        cand_classes.append(c_idx)

    scores_all = jnp.concatenate(cand_scores)  # logits, descending per level
    boxes_all = jnp.concatenate(cand_boxes)
    classes_all = jnp.concatenate(cand_classes)
    return scores_all, boxes_all, classes_all


def merge_candidates(
    scores_all: Array,
    boxes_all: Array,
    classes_all: Array,
    image_size: Array,
    *,
    pre_nms_top_k: int = PRE_NMS_TOP_K,
    score_thres: float = SCORE_THRES,
):
    """Stage 2 of the multilevel postprocess: cross-level top-k merge,
    sigmoid, clip, validity mask — everything between candidate selection
    and NMS. Returns (boxes [k,4], scores [k], class_idx [k], valid [k])."""
    k = min(pre_nms_top_k, scores_all.shape[0])
    top_logits, top_idx = jax.lax.top_k(scores_all, k)
    top_scores = jax.nn.sigmoid(top_logits)
    boxes = clip_boxes(boxes_all[top_idx], image_size)
    class_idx = classes_all[top_idx]
    valid = (top_scores > score_thres) & small_box_mask(boxes)
    return boxes, top_scores, class_idx, valid


def process_detections_multilevel_batch(
    cls_levels: Sequence[Array],
    box_levels: Sequence[Array],
    anchors_levels: Sequence[Array],
    image_sizes: Array,
    **kwargs,
) -> Detections:
    """Batched multilevel postprocess: per-level [B, HWA_l, C] logits."""
    n_levels = len(cls_levels)

    def one(args):
        cls_l = args[:n_levels]
        box_l = args[n_levels : 2 * n_levels]
        size = args[-1]
        return process_detections_multilevel(
            cls_l, box_l, anchors_levels, size, **kwargs
        )

    return jax.vmap(one)(tuple(cls_levels) + tuple(box_levels) + (image_sizes,))


def process_detections_batch(
    cls_logits: Array,
    box_deltas: Array,
    anchors: Array,
    image_sizes: Array,
    **kwargs,
) -> Detections:
    """Batched postprocess: [B, A, C] logits, [B, 2] per-image resized sizes."""
    return jax.vmap(
        lambda c, b, s: process_detections(c, b, anchors, s, **kwargs)
    )(cls_logits, box_deltas, image_sizes)
