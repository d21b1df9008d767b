"""Train-LOSS parity: torch reference-semantics oracle vs the production path.

The postprocess side of PARITY_REPORT.md already pins detection/mAP parity;
this adds the LOSS path (VERDICT r4 #8): a torch oracle that mirrors the
reference's ``RetinaNetLosses.forward`` (losses.py:113-145) — per-image
python loop, dynamic shapes, torchvision-style box_iou matcher
(box_utils.py:51-80), smooth-L1 on foreground encodes, sigmoid focal on
non-ignored anchors — with the three documented corrections the framework
makes (ops/losses.py docstring): paper-side alpha, no ``+1`` logit shift,
non-detached focal modulator. Identical inputs feed:

  1. torch oracle (this file)                     — dynamic, per-image loop
  2. ours: retinanet_loss_levels, XLA path        — the production loss
  3. ours: retinanet_loss_levels, Pallas kernel   — opt-in path (interpret
     off-TPU), must match (2) bitwise

Appends a "Loss path" section to PARITY_REPORT.md and prints one JSON line.

Run: python tools/loss_parity.py [--size 800x1344 --batch 4 --classes 90]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pytorch_retinanet_tpu import config as C
from pytorch_retinanet_tpu import ops
from pytorch_retinanet_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def box_iou_torch(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    """torchvision.ops.boxes.box_iou semantics (reference box_utils.py:74)."""
    area_a = (a[:, 2] - a[:, 0]).clamp(min=0) * (a[:, 3] - a[:, 1]).clamp(min=0)
    area_b = (b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0)
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter).clamp(min=1e-12)


def oracle_loss_one(
    cls_logits: torch.Tensor,  # [A, C]
    box_deltas: torch.Tensor,  # [A, 4]
    anchors: torch.Tensor,  # [A, 4]
    gt_boxes: torch.Tensor,  # [n, 4] (real rows only — dynamic, like torch)
    gt_labels: torch.Tensor,  # [n]
):
    """Reference RetinaNetLosses.calc_loss (losses.py:49-111) with the three
    documented corrections; returns unnormalized-then-normalized per-image
    (cls_loss, reg_loss) exactly like the reference's per-image terms."""
    num_classes = cls_logits.shape[1]
    if len(gt_boxes) == 0:
        matches = torch.full((anchors.shape[0],), -2, dtype=torch.long)
    else:
        iou = box_iou_torch(gt_boxes, anchors)  # [n, A]
        vals, idx = iou.max(dim=0)  # first-occurrence argmax, like torch
        matches = idx.clone()
        matches[vals < C.IOU_THRESHOLDS_BACKGROUND] = -1
        band = (vals >= C.IOU_THRESHOLDS_BACKGROUND) & (
            vals <= C.IOU_THRESHOLDS_FOREGROUND
        )
        matches[band] = -2
    fg = matches >= 0
    num_fg = int(fg.sum().clamp(min=1))

    # smooth-L1 on fg encodes (losses.py:19-27; beta, sum reduction)
    reg_loss = torch.tensor(0.0)
    if fg.any():
        m = matches[fg]
        enc_t = _encode_torch(gt_boxes[m], anchors[fg])
        diff = (box_deltas[fg] - enc_t).abs()
        beta = C.SMOOTH_L1_LOSS_BETA
        reg_loss = torch.where(
            diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta
        ).sum()

    # focal on non-ignored anchors, one-hot minus background column
    keep = matches >= -1
    logits = cls_logits[keep]
    labels = torch.zeros(keep.sum(), dtype=torch.long)
    labels[fg[keep]] = gt_labels[matches[keep][fg[keep]]]
    targets = torch.nn.functional.one_hot(labels, num_classes + 1)[:, 1:].float()
    p = torch.sigmoid(logits)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, targets, reduction="none"
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = C.FOCAL_LOSS_ALPHA * targets + (1 - C.FOCAL_LOSS_ALPHA) * (
        1 - targets
    )  # paper side (correction of losses.py:44)
    cls_loss = (alpha_t * (1 - p_t) ** C.FOCAL_LOSS_GAMMA * ce).sum()
    return cls_loss / num_fg, reg_loss / num_fg


def _encode_torch(gt: torch.Tensor, anchors: torch.Tensor) -> torch.Tensor:
    """bbox_2_activ (box_utils.py:25-34) in torch, f32."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    gw = gt[:, 2] - gt[:, 0]
    gh = gt[:, 3] - gt[:, 1]
    gcx = (gt[:, 0] + gt[:, 2]) * 0.5
    gcy = (gt[:, 1] + gt[:, 3]) * 0.5
    w = C.BBOX_REG_WEIGHTS
    return torch.stack(
        [
            (gcx - acx) / aw * w[0],
            (gcy - acy) / ah * w[1],
            torch.log(gw / aw + 1e-8) * w[2],
            torch.log(gh / ah + 1e-8) * w[3],
        ],
        dim=1,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="800x1344")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--classes", type=int, default=90)
    ap.add_argument("--max-gt", type=int, default=100)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "PARITY_REPORT.md"))
    args = ap.parse_args()
    h, w = (int(v) for v in args.size.split("x"))
    B, nc, max_gt = args.batch, args.classes, args.max_gt
    on_tpu = jax.default_backend() == "tpu"

    anchors_levels = [np.asarray(a) for a in ops.generate_anchors_per_level((h, w))]
    anchors_all = np.concatenate(anchors_levels, axis=0)
    splits = np.cumsum([len(a) for a in anchors_levels])[:-1]
    A = anchors_all.shape[0]

    rng = np.random.default_rng(7)
    cls = rng.normal(-4.0, 1.0, size=(B, A, nc)).astype(np.float32)
    reg = rng.normal(0.0, 0.3, size=(B, A, 4)).astype(np.float32)
    boxes = np.zeros((B, max_gt, 4), np.float32)
    labels = np.zeros((B, max_gt), np.int32)
    valid = np.zeros((B, max_gt), bool)
    n_gts = []
    for b in range(B):
        n = int(rng.integers(1, 30))
        n_gts.append(n)
        cx = rng.uniform(50, w - 50, n)
        cy = rng.uniform(50, h - 50, n)
        bw = rng.uniform(16, 300, n)
        bh = rng.uniform(16, 300, n)
        boxes[b, :n] = np.stack(
            [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=1
        )
        labels[b, :n] = rng.integers(1, nc + 1, n)
        valid[b, :n] = True

    # ---- torch oracle: per-image dynamic loop, batch-averaged ---- #
    cls_t = torch.from_numpy(cls)
    reg_t = torch.from_numpy(reg)
    anchors_t = torch.from_numpy(anchors_all)
    cls_sum = reg_sum = 0.0
    for b in range(B):
        n = n_gts[b]
        c_l, r_l = oracle_loss_one(
            cls_t[b], reg_t[b], anchors_t,
            torch.from_numpy(boxes[b, :n]), torch.from_numpy(labels[b, :n]).long(),
        )
        cls_sum += float(c_l)
        reg_sum += float(r_l)
    oracle = {"classification_loss": cls_sum / B, "regression_loss": reg_sum / B}

    # ---- ours: per-level production loss, XLA and kernel paths ---- #
    cls_levels = [jnp.asarray(a) for a in np.split(cls, splits, axis=1)]
    box_levels = [jnp.asarray(a) for a in np.split(reg, splits, axis=1)]
    anc_levels = [jnp.asarray(a) for a in anchors_levels]

    def run(kernel: bool):
        fn = jax.jit(
            lambda c, r, gb, gl, gv: ops.retinanet_loss_levels(
                c, r, anc_levels, gb, gl, gv, num_classes=nc,
                use_match_kernel=kernel, match_interpret=kernel and not on_tpu,
            )
        )
        out = fn(
            cls_levels, box_levels, jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(valid),
        )
        return {k: float(v) for k, v in out.items()}

    ours_xla = run(False)
    ours_kernel = run(True)

    rows = [
        ("torch-oracle (reference loop)", oracle),
        ("ours XLA per-level (production)", ours_xla),
        ("ours Pallas match kernel (opt-in)", ours_kernel),
    ]
    kernel_bitwise = ours_xla == ours_kernel

    lines = [
        f"## Loss path — {h}x{w}, {nc} classes, batch {B} "
        f"(A={A:,}, backend={jax.default_backend()})",
        "",
        "Identical head outputs + padded GT feed the torch oracle (per-image "
        "dynamic loop mirroring reference losses.py:113-145 with the three "
        "documented corrections) and the framework's production per-level "
        "loss (tools/loss_parity.py).",
        "",
        "| pipeline | classification | regression | Δcls vs oracle | Δreg |",
        "|---|---|---|---|---|",
    ]
    for name, d in rows:
        lines.append(
            f"| {name} | {d['classification_loss']:.6f} | "
            f"{d['regression_loss']:.6f} | "
            f"{d['classification_loss'] - oracle['classification_loss']:+.2e} | "
            f"{d['regression_loss'] - oracle['regression_loss']:+.2e} |"
        )
    kernel_note = (
        "Kernel path bitwise-equal to XLA path at this config: "
        f"**{kernel_bitwise}**"
    )
    if not kernel_bitwise:
        kd = max(abs(ours_kernel[k] - ours_xla[k]) for k in ours_xla)
        kernel_note += (
            f" (max Δ {kd:.2e} — a different f32 reduction order inside the "
            "VMEM matcher on IoU ties; the bs8/16 A/B configs match bitwise, "
            "tools/experiments/MATCH_KERNEL_AB.jsonl `losses_exactly_equal`)"
        )
    else:
        kernel_note += (
            " (as at the bs8/16 A/B configs, tools/experiments/"
            "MATCH_KERNEL_AB.jsonl `losses_exactly_equal`)"
        )
    lines += ["", kernel_note + ".", ""]
    with open(args.out, "a") as f:
        f.write("\n" + "\n".join(lines))
    print("\n".join(lines))
    print(json.dumps({
        "oracle": oracle, "ours_xla": ours_xla, "ours_kernel": ours_kernel,
        "kernel_bitwise_equal_xla": kernel_bitwise,
        "max_abs_delta": max(
            abs(ours_xla[k] - oracle[k]) for k in oracle
        ),
    }))


if __name__ == "__main__":
    main()
