"""RetinaNet training losses — batched, fixed-shape, fully fused under XLA.

Rebuilds the reference's ``retinanet/losses.py`` without its per-image python
loop (losses.py:126-135): the matcher, target encoding, sigmoid focal loss and
smooth-L1 all run as one traced computation over ``[B, A]`` anchors, so XLA can
fuse the elementwise work into a handful of kernels and keep everything on-chip.

Semantics match the reference where it is faithful to the paper, with these
documented corrections (the reference quirks are bugs, not features):

  * Focal alpha follows the paper (arXiv:1708.02002): foreground weight ``alpha``
    (0.25), background ``1 - alpha``. The reference applies it inverted
    (losses.py:44 gives foreground 0.75).
  * No ``+1`` is added to the raw logits (the reference's ``clas_pred + 1`` at
    losses.py:84 uniformly shifts logits — a label-offset bookkeeping slip).
  * The focal modulating factor ``(1 - p_t)^gamma`` participates in the gradient
    (the reference detaches it, losses.py:42). This matches torchvision's
    ``sigmoid_focal_loss`` and the paper's stated objective.

Shared conventions with the reference:
  * Class labels arrive in ``[1, num_classes]`` with 0 reserved for background
    (losses.py:80-102); the one-hot target drops the background column.
  * Both losses are normalized by ``clamp(num_foreground, 1)`` per image
    (losses.py:108-109) and averaged over the batch (losses.py:138-140).
  * Anchors matched into the ignore band contribute to neither loss.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..config import (
    BBOX_REG_WEIGHTS,
    FOCAL_LOSS_ALPHA,
    FOCAL_LOSS_GAMMA,
    IOU_THRESHOLDS_BACKGROUND,
    IOU_THRESHOLDS_FOREGROUND,
    SMOOTH_L1_LOSS_BETA,
)
from .boxes import encode_boxes
from .matcher import match_anchors_batch

Array = jnp.ndarray


def smooth_l1_loss(pred: Array, target: Array, beta: float = SMOOTH_L1_LOSS_BETA) -> Array:
    """Elementwise smooth-L1 (Huber) loss (reference: losses.py:19-27).

    Returns the unreduced elementwise loss; callers mask and reduce.
    """
    n = jnp.abs(pred - target)
    if beta < 1e-5:
        return n
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def sigmoid_focal_loss(
    logits: Array,
    targets: Array,
    alpha: float = FOCAL_LOSS_ALPHA,
    gamma: float = FOCAL_LOSS_GAMMA,
) -> Array:
    """Elementwise sigmoid focal loss, numerically stable, paper semantics.

    FL(p_t) = -alpha_t * (1 - p_t)^gamma * log(p_t), computed from logits via a
    stable BCE. Returns the unreduced elementwise loss.

    Written the straightforward way ON PURPOSE: a hand-optimized variant
    sharing one exp/log1p/reciprocal across the sigmoid, the stable BCE and
    a multiplied-out gamma=2 modulator measured EXACTLY NEUTRAL on chip
    (standalone per-level loss 8.00 vs 8.09 ms fwd, 11.4 vs 11.3 grad at
    bs16/800px; in-program loss cut 19.6 ms both ways — round 5). XLA's
    algebraic simplifier already performs the sharing; keep the readable
    form.
    """
    # Stable BCE with logits: max(x,0) - x*t + log1p(exp(-|x|))
    bce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p = jax.nn.sigmoid(logits)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return alpha_t * jnp.power(1.0 - p_t, gamma) * bce


def retinanet_loss(
    cls_logits: Array,
    box_deltas: Array,
    anchors: Array,
    gt_boxes: Array,
    gt_labels: Array,
    gt_valid: Array,
    *,
    num_classes: int,
    fg_iou_thr: float = IOU_THRESHOLDS_FOREGROUND,
    bg_iou_thr: float = IOU_THRESHOLDS_BACKGROUND,
    alpha: float = FOCAL_LOSS_ALPHA,
    gamma: float = FOCAL_LOSS_GAMMA,
    beta: float = SMOOTH_L1_LOSS_BETA,
    reg_weights: Sequence[float] = tuple(BBOX_REG_WEIGHTS),
    reduction: str = "mean",
) -> Dict[str, Array]:
    """Full RetinaNet loss over a padded batch.

    Args:
      cls_logits: [B, A, C] raw class logits from the head.
      box_deltas: [B, A, 4] raw regression activations.
      anchors: [A, 4] XYXY anchors shared across the batch.
      gt_boxes: [B, N, 4] XYXY ground truth, padded to static N.
      gt_labels: [B, N] int labels in [1, num_classes] (0 = background slot).
      gt_valid: [B, N] bool mask of real GT rows.
      reduction: "mean" (batch-averaged scalars, reference losses.py:138-140)
        or "none" (per-image [B] losses — used by the eval loop to mask
        padded batch rows).

    Returns:
      {"classification_loss", "regression_loss"} — same keys as the reference
      (losses.py:143-144).
    """
    reg_sum, cls_sum, num_fg = _loss_sums(
        cls_logits, box_deltas, anchors, gt_boxes, gt_labels, gt_valid,
        num_classes=num_classes, fg_iou_thr=fg_iou_thr, bg_iou_thr=bg_iou_thr,
        alpha=alpha, gamma=gamma, beta=beta, reg_weights=reg_weights,
    )
    norm = jnp.maximum(num_fg.astype(jnp.float32), 1.0)  # [B]
    regression_loss = reg_sum / norm
    classification_loss = cls_sum / norm

    if reduction == "mean":
        classification_loss = jnp.mean(classification_loss)
        regression_loss = jnp.mean(regression_loss)
    return {
        "classification_loss": classification_loss,
        "regression_loss": regression_loss,
    }


def retinanet_loss_levels(
    cls_levels,
    box_levels,
    anchors_levels,
    gt_boxes: Array,
    gt_labels: Array,
    gt_valid: Array,
    *,
    num_classes: int,
    fg_iou_thr: float = IOU_THRESHOLDS_FOREGROUND,
    bg_iou_thr: float = IOU_THRESHOLDS_BACKGROUND,
    alpha: float = FOCAL_LOSS_ALPHA,
    gamma: float = FOCAL_LOSS_GAMMA,
    beta: float = SMOOTH_L1_LOSS_BETA,
    reg_weights: Sequence[float] = tuple(BBOX_REG_WEIGHTS),
    reduction: str = "mean",
    use_match_kernel: bool | None = None,
    match_interpret: bool = False,
    match_mesh=None,
) -> Dict[str, Array]:
    """:func:`retinanet_loss` on PER-LEVEL head outputs — identical result.

    Matching is per-anchor and the per-image foreground normalizer is a
    scalar, so the loss decomposes exactly into per-level unnormalized sums
    that combine afterwards. This skips the cross-level ``[B, A_total, C]``
    concat of the head outputs, which costs ~10 ms/batch8 at 800px on v5e —
    the training-path twin of the per-level postprocess design (ops/nms.py).

    ``use_match_kernel`` routes the matcher + matched-GT lookup + box
    encoding through the Pallas VMEM kernel (kernels/match_pallas.py) —
    targets bitwise-identical at the A/B configs, within ~1 ulp elsewhere
    (IoU-tie argmax order; see the kernel docstring). Default OFF
    (round-5 measured negative,
    tools/experiments/MATCH_KERNEL_AB.jsonl): on v5e at 800x1344/90
    classes/100 GT the kernel is +0.3 ms/step at bs16 (fwd 8.45 vs 8.09 ms,
    grad 11.81 vs 11.27, reproduced) and -0.15 ms at bs8 — XLA already
    pipelines the [B, A, N] intermediates well enough that the VMEM pass
    buys nothing at production shapes. The kernel stays as opt-in,
    compiled-parity-tested groundwork (TPU_SELFCHECK match_targets_compiled)
    like the fused-bottleneck negative. ``None`` resolves to False;
    ``match_interpret`` runs the kernel in interpret mode (tests).
    """
    if use_match_kernel is None:
        use_match_kernel = False
    reg_sum = cls_sum = num_fg = 0.0
    for cls_l, box_l, anc_l in zip(cls_levels, box_levels, anchors_levels):
        r, c, f = _loss_sums(
            cls_l, box_l, jnp.asarray(anc_l), gt_boxes, gt_labels, gt_valid,
            num_classes=num_classes, fg_iou_thr=fg_iou_thr,
            bg_iou_thr=bg_iou_thr, alpha=alpha, gamma=gamma, beta=beta,
            reg_weights=reg_weights, use_match_kernel=use_match_kernel,
            match_interpret=match_interpret, match_mesh=match_mesh,
        )
        reg_sum = reg_sum + r
        cls_sum = cls_sum + c
        num_fg = num_fg + f
    norm = jnp.maximum(num_fg.astype(jnp.float32), 1.0)
    regression_loss = reg_sum / norm
    classification_loss = cls_sum / norm
    if reduction == "mean":
        classification_loss = jnp.mean(classification_loss)
        regression_loss = jnp.mean(regression_loss)
    return {
        "classification_loss": classification_loss,
        "regression_loss": regression_loss,
    }


def _loss_sums(
    cls_logits: Array,
    box_deltas: Array,
    anchors: Array,
    gt_boxes: Array,
    gt_labels: Array,
    gt_valid: Array,
    *,
    num_classes: int,
    fg_iou_thr: float,
    bg_iou_thr: float,
    alpha: float,
    gamma: float,
    beta: float,
    reg_weights: Sequence[float],
    use_match_kernel: bool = False,
    match_interpret: bool = False,
    match_mesh=None,
):
    """Unnormalized per-image loss sums over one anchor set.

    Returns (reg_sum [B], cls_sum [B], num_fg [B]) so callers can combine
    several anchor subsets (pyramid levels) before normalizing.
    """
    cls_logits = cls_logits.astype(jnp.float32)
    box_deltas = box_deltas.astype(jnp.float32)
    gt_boxes = gt_boxes.astype(jnp.float32)

    if use_match_kernel:
        # Matcher + matched-GT lookup + encode in one Pallas VMEM pass —
        # bitwise-identical to the XLA composition below, without its
        # [B, A, N]-sized HBM intermediates. The targets are constants
        # w.r.t. the network parameters (matching is non-differentiable),
        # so no VJP is needed; stop_gradient documents that and keeps
        # autodiff from attempting to differentiate the pallas_call.
        import functools as _ft

        from ..kernels.match_pallas import match_targets

        fn = _ft.partial(
            match_targets,
            fg_iou_thr=fg_iou_thr, bg_iou_thr=bg_iou_thr,
            reg_weights=tuple(reg_weights), interpret=match_interpret,
        )
        if match_mesh is not None and match_mesh.devices.size > 1:
            # pallas_call has no SPMD partitioning rule: under a >1-device
            # mesh it must run shard_mapped over the batch (each device
            # matches its local rows; the kernel is embarrassingly
            # batch-parallel) — the make_sharded_stem pattern
            # (parallel/sharding.py).
            from jax.sharding import PartitionSpec as _P

            fn = jax.shard_map(
                fn,
                mesh=match_mesh,
                in_specs=(_P(), _P("data"), _P("data"), _P("data")),
                out_specs=(_P("data"), _P("data"), _P("data")),
                check_vma=False,
            )
        matches, fg_labels, reg_targets = jax.lax.stop_gradient(
            fn(anchors, gt_boxes, gt_labels, gt_valid)
        )
        fg_mask = matches >= 0  # [B, A]
    else:
        matches, _ = match_anchors_batch(
            anchors, gt_boxes, gt_valid, fg_iou_thr, bg_iou_thr
        )  # [B, A]
        fg_mask = matches >= 0  # [B, A]

        # Matched-GT lookup as a one-hot MATMUL, not take_along_axis: XLA:TPU
        # lowers a [B, A]-indexed gather from [B, N, .] to a serialized gather
        # (~22 ms at B8/A200k — measured), while onehot[B,A,N] @ gt[B,N,5] is a
        # tiny MXU contraction (N=100) whose backward is a matmul too (the
        # gather's backward is an even-slower scatter-add).
        n_gt = gt_boxes.shape[1]
        safe_idx = jnp.maximum(matches, 0)  # [B, A]
        onehot = (
            safe_idx[..., None] == jnp.arange(n_gt, dtype=jnp.int32)
        ).astype(jnp.float32)  # [B, A, N]
        gt_cat = jnp.concatenate(
            [gt_boxes, gt_labels.astype(jnp.float32)[..., None]], axis=-1
        )  # [B, N, 5]
        gathered = jax.lax.dot_general(
            onehot,
            gt_cat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            # HIGHEST: the default TPU matmul precision truncates f32 operands
            # to bf16, which would quantize GT coordinates (spacing 8 in
            # [1024, 2048)) and corrupt the regression targets. N=100 — full
            # precision is free.
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, A, 5]
        matched_boxes = gathered[..., :4]
        # exact: one-hot selection of integers <= num_classes in f32
        matched_labels = gathered[..., 4].astype(jnp.int32)  # [B, A]
        reg_targets = encode_boxes(
            matched_boxes, anchors[None], reg_weights
        )  # [B, A, 4]
        fg_labels = jnp.where(fg_mask, matched_labels, 0)  # 0 => background

    num_fg = jnp.sum(fg_mask, axis=1)  # [B]

    # ---- Regression: smooth-L1 on encoded deltas of foreground anchors ---- #
    reg_elem = smooth_l1_loss(box_deltas, reg_targets, beta)  # [B, A, 4]
    reg_sum = jnp.sum(
        jnp.sum(reg_elem, axis=-1) * fg_mask.astype(jnp.float32), axis=1
    )  # [B]

    # ---- Classification: focal loss on non-ignored anchors ---- #
    # Foreground anchors get one-hot(label - 1) over C classes; background
    # all-zero: one_hot over C+1 then drop column 0 (reference
    # losses.py:96-102).
    cls_targets = _one_hot(fg_labels, num_classes + 1)[..., 1:]  # [B, A, C]
    cls_elem = sigmoid_focal_loss(cls_logits, cls_targets, alpha, gamma)  # [B, A, C]
    not_ignored = (matches >= -1).astype(jnp.float32)  # [B, A]
    cls_sum = jnp.sum(jnp.sum(cls_elem, axis=-1) * not_ignored, axis=1)  # [B]
    return reg_sum, cls_sum, num_fg


def _one_hot(x: Array, num_classes: int) -> Array:
    """One-hot via comparison — avoids int gather, fuses cleanly on the VPU."""
    return (x[..., None] == jnp.arange(num_classes, dtype=x.dtype)).astype(jnp.float32)
