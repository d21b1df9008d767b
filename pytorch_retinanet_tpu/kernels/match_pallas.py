"""Pallas TPU kernel: anchor matching + loss-target construction in VMEM.

STATUS (round 5): **measured negative — OFF by default** (opt-in via
``use_match_kernel=True``). The round-4 hypothesis was that the XLA
composition's [B, A, N]-shaped intermediates (IoU matrix, argmax, one-hot
matmul operand) cost real HBM time; the direct A/B at production shapes
(800x1344, 90 classes, 100 GT; tools/experiments/MATCH_KERNEL_AB.jsonl)
refutes it: XLA's loss forward is 8.09 ms at bs16 and the kernel arm is
8.45 ms (grad 11.27 vs 11.81; reproduced twice; bs8 is -0.15 ms, also
noise-level). XLA fuses/pipelines the big intermediates well enough that
eliminating them buys nothing — the same lesson as the fused-bottleneck
trunk (docs/ROOFLINE_BACKBONE.md). The kernel remains as compiled-exact,
parity-tested groundwork for shapes where the balance may differ (huge
N_gt, small batch).

The kernel computes the whole pipeline — pairwise IoU, threshold matching
with the ignore band, matched-GT gather, and box encoding — in one VMEM
pass per (image, anchor-tile) grid cell: per cell it loads an anchor tile
(planar [4, T], anchors on lanes) and the image's padded GT ([N_pad, 8]
rows: x1 y1 x2 y2 label valid 0 0), forms the [N_pad, T] IoU plane by
rank-2 broadcast (GT on sublanes), reduces it, and writes three row-shaped
outputs. (The reference reaches the same targets through a per-image
python loop over torchvision's box_iou at losses.py:126-135 /
box_utils.py:51-80.)

Everything here is CONSTANT with respect to the network parameters
(matching is not differentiable; the loss backward only needs
d(focal)/d(logits) and d(smooth-L1)/d(deltas) against these targets), so
the kernel needs NO custom VJP — callers wrap the outputs in
``stop_gradient`` and the elementwise loss tail stays in XLA.

Bitwise parity with the XLA path (``ops.matcher.match_anchors_batch`` +
the one-hot-matmul gather + ``ops.boxes.encode_boxes``) is by construction:
identical op-for-op f32 formulas, first-occurrence argmax (min index among
IoU maxima), the same strict </> thresholds, the same safe-index-0 gather
for non-foreground anchors, and the same zero-valid-GT all-ignore rule —
tested exact (not approximate) in tests/test_match_kernel.py and on-chip
in tools/tpu_selfcheck.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_ENCODE_EPS = 1e-8  # must match ops.boxes._ENCODE_EPS
_IOU_EPS = 1e-12  # must match ops.boxes.box_iou's union clamp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _match_kernel(
    anchors_ref,  # [4, T] f32: x1 y1 x2 y2 rows, anchors on lanes
    gt_ref,  # [1, N_pad, 8] f32: x1 y1 x2 y2 label valid 0 0 rows
    matches_ref,  # [1, 1, T] int32 out
    fg_labels_ref,  # [1, 1, T] int32 out
    regp_ref,  # [1, 4, T] f32 out: tcx tcy tw th rows
    *,
    fg_iou_thr: float,
    bg_iou_thr: float,
    reg_weights: tuple,
    n_pad: int,
):
    ax1 = anchors_ref[0:1, :]  # [1, T]
    ay1 = anchors_ref[1:2, :]
    ax2 = anchors_ref[2:3, :]
    ay2 = anchors_ref[3:4, :]

    gt = gt_ref[0]  # [N_pad, 8]
    gx1 = gt[:, 0:1]  # [N_pad, 1]
    gy1 = gt[:, 1:2]
    gx2 = gt[:, 2:3]
    gy2 = gt[:, 3:4]
    glabel = gt[:, 4:5]
    gvalid = gt[:, 5:6]

    # Pairwise IoU [N_pad, T] — op-for-op ops.boxes.box_iou (areas clamped
    # at zero, union clamped at 1e-12), invalid GT rows forced to -1 the
    # way the matcher does.
    iw = jnp.maximum(jnp.minimum(gx2, ax2) - jnp.maximum(gx1, ax1), 0.0)
    ih = jnp.maximum(jnp.minimum(gy2, ay2) - jnp.maximum(gy1, ay1), 0.0)
    inter = iw * ih
    area_a = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)  # [1,T]
    area_g = jnp.maximum(gx2 - gx1, 0.0) * jnp.maximum(gy2 - gy1, 0.0)  # [N,1]
    union = area_g + area_a - inter
    iou = inter / jnp.maximum(union, _IOU_EPS)
    iou = jnp.where(gvalid > 0.0, iou, -1.0)

    best_iou = jnp.max(iou, axis=0, keepdims=True)  # [1, T]
    # First-occurrence argmax = min GT index among the IoU maxima (matches
    # jnp.argmax in ops.matcher.match_anchors).
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_pad, iou.shape[1]), 0)
    at_max = iou == best_iou
    best_idx = jnp.min(
        jnp.where(at_max, idx, n_pad), axis=0, keepdims=True
    )  # [1, T] int32

    matches = jnp.full(best_idx.shape, -2, jnp.int32)
    matches = jnp.where(best_iou < bg_iou_thr, -1, matches)
    matches = jnp.where(best_iou > fg_iou_thr, best_idx, matches)
    any_gt = jnp.max(gvalid)  # scalar 0/1
    matches = jnp.where(any_gt > 0.0, matches, -2)

    fg = matches >= 0  # [1, T]
    # Gather the matched GT row — index 0 for non-foreground anchors, the
    # XLA path's safe_idx = max(matches, 0) (losses.py), so reg_targets are
    # bitwise identical EVERYWHERE, not just on foreground rows.
    sel_idx = jnp.where(fg, best_idx, 0)
    onehot = (idx == sel_idx).astype(jnp.float32)  # [N_pad, T]
    mx1 = jnp.sum(gx1 * onehot, axis=0, keepdims=True)  # [1, T]
    my1 = jnp.sum(gy1 * onehot, axis=0, keepdims=True)
    mx2 = jnp.sum(gx2 * onehot, axis=0, keepdims=True)
    my2 = jnp.sum(gy2 * onehot, axis=0, keepdims=True)
    mlabel = jnp.sum(glabel * onehot, axis=0, keepdims=True)

    # encode_boxes, op-for-op: cxcywh via (lo + hi) * 0.5 / hi - lo, then
    # delta-centers over anchor sizes and log size ratios with the 1e-8
    # stabilizer, scaled by reg_weights.
    acx = (ax1 + ax2) * 0.5
    acy = (ay1 + ay2) * 0.5
    aw = ax2 - ax1
    ah = ay2 - ay1
    mcx = (mx1 + mx2) * 0.5
    mcy = (my1 + my2) * 0.5
    mw = mx2 - mx1
    mh = my2 - my1
    w0, w1, w2, w3 = (float(w) for w in reg_weights)
    tcx = (mcx - acx) / aw * w0
    tcy = (mcy - acy) / ah * w1
    tw = jnp.log(mw / aw + _ENCODE_EPS) * w2
    th = jnp.log(mh / ah + _ENCODE_EPS) * w3

    matches_ref[0] = matches
    fg_labels_ref[0] = jnp.where(fg, mlabel.astype(jnp.int32), 0)
    regp_ref[0] = jnp.concatenate([tcx, tcy, tw, th], axis=0)  # [4, T]


@functools.partial(
    jax.jit,
    static_argnames=(
        "fg_iou_thr", "bg_iou_thr", "reg_weights", "tile", "interpret",
    ),
)
def match_targets(
    anchors: Array,
    gt_boxes: Array,
    gt_labels: Array,
    gt_valid: Array,
    *,
    fg_iou_thr: float,
    bg_iou_thr: float,
    reg_weights: tuple = (1.0, 1.0, 1.0, 1.0),
    tile: int = 1024,
    interpret: bool = False,
):
    """Match + loss targets for one anchor set (pyramid level).

    Args:
      anchors: [A, 4] f32 XYXY (shared across the batch).
      gt_boxes: [B, N, 4] f32 XYXY, padded.
      gt_labels: [B, N] int GT labels (1-based; 0 is background).
      gt_valid: [B, N] bool mask of real GT rows.

    Returns:
      (matches [B, A] int32 with -1 bg / -2 ignore codes,
       fg_labels [B, A] int32 — matched label on foreground anchors, else 0,
       reg_targets [B, A, 4] f32 — encoded on the safe-index gather)
      — bitwise equal to the XLA composition in ops.losses._loss_sums at
      the on-chip A/B configs (MATCH_KERNEL_AB.jsonl, bs8/16); on other
      inputs IoU-tie argmax order can differ in the last f32 ulp of a few
      reg targets (loss Δ ≤ 6e-8 observed, tools/loss_parity.py bs4).
      All three are parameter-independent; callers should stop_gradient.
    """
    b, n = gt_boxes.shape[0], gt_boxes.shape[1]
    a = anchors.shape[0]
    a_pad = _round_up(a, tile)
    n_pad = _round_up(max(n, 8), 8)

    # Planar [4, A_pad] anchors, padded with unit boxes (finite encodes;
    # padded lanes are sliced off below). Constant-folded: anchors are
    # compile-time constants of the step.
    pad_box = jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32)
    anchors_pad = jnp.concatenate(
        [
            anchors.astype(jnp.float32),
            jnp.broadcast_to(pad_box, (a_pad - a, 4)),
        ],
        axis=0,
    )
    anchors_planar = anchors_pad.T  # [4, A_pad]

    # GT rows [B, N_pad, 8]: x1 y1 x2 y2 label valid 0 0. Padded rows have
    # valid=0 and are forced out of every match inside the kernel.
    gt8 = jnp.concatenate(
        [
            gt_boxes.astype(jnp.float32),
            gt_labels.astype(jnp.float32)[..., None],
            gt_valid.astype(jnp.float32)[..., None],
            jnp.zeros((b, n, 2), jnp.float32),
        ],
        axis=-1,
    )
    gt8 = jnp.pad(gt8, ((0, 0), (0, n_pad - n), (0, 0)))

    grid = (b, a_pad // tile)
    kernel = functools.partial(
        _match_kernel,
        fg_iou_thr=float(fg_iou_thr),
        bg_iou_thr=float(bg_iou_thr),
        reg_weights=tuple(float(w) for w in reg_weights),
        n_pad=n_pad,
    )
    matches, fg_labels, regp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tile), lambda i, j: (0, j)),
            pl.BlockSpec((1, n_pad, 8), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            # [B, 1, A_pad] (not [B, A_pad]): Mosaic requires the last two
            # block dims divisible by (8, 128) or equal to the array dims —
            # the singleton second-minor satisfies the "equal" arm.
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 4, tile), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, a_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, a_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 4, a_pad), jnp.float32),
        ],
        interpret=interpret,
    )(anchors_planar, gt8)

    reg_targets = jnp.transpose(regp[:, :, :a], (0, 2, 1))  # [B, A, 4]
    return matches[:, 0, :a], fg_labels[:, 0, :a], reg_targets
