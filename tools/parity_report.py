"""Measured detection-parity report: TPU postprocess variants vs torch oracle.

Generates a synthetic COCO-style val set (planted GT → noisy head outputs),
runs the postprocess pipelines below on IDENTICAL inputs, evaluates each with
the framework's COCO evaluator, and writes ``PARITY_REPORT.md``:

  1. torch oracle        — reference semantics (models.py:160-243), dynamic
  2. ours exact, full-k  — fused postprocess, exhaustive candidate selection
  3. ours exact, top-k   — production candidate truncation (1000/level)
  4. ours approx top-k   — production default (approx_max_k on TPU)
  5. + Pallas NMS        — production default with the compiled Pallas kernel
                           (TPU only; on CPU this row is skipped)

This replaces "mAP effect expected nil" language with numbers (VERDICT r1),
and supports the PRODUCTION bucket (``--size 800x1344 --classes 90``) where
the approx/two-stage tie-margin arguments actually bite (VERDICT r2 #5):
head outputs are regenerated per image from a per-image seed instead of being
held in memory (50 images x [245k, 90] f32 would be ~4.4 GB).

Run:  python tools/parity_report.py                        # small CPU config
      python tools/parity_report.py --size 800x1344 --classes 90 --append
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import numpy as np
import torch

from pytorch_retinanet_tpu import ops
from pytorch_retinanet_tpu.data.coco import COCOIndex
from pytorch_retinanet_tpu.eval import CocoEvaluator
from pytorch_retinanet_tpu.utils import enable_compilation_cache
from reference_oracle import encode_boxes_torch, process_detections_torch

enable_compilation_cache()


def make_val_set(n_images: int, n_classes: int, image_size, seed: int = 0):
    """Synthetic GT + a per-image head-output generator.

    Head outputs derive from the GT: anchors matched to a GT get its class
    logit spiked to a confidence drawn from U(0.55, 0.95) and regression
    targets encoded with sigma=0.05 noise; distractor anchors get mid scores.
    Returns (anchors, gt_index, gen) with ``gen(img_id) -> (cls, reg)``
    regenerated deterministically — call once per image and feed every
    pipeline before moving on.
    """
    h, w = image_size
    anchors = ops.generate_anchors(image_size)
    A = anchors.shape[0]

    rng = np.random.default_rng(seed)
    images, annotations = [], []
    gt_by_image = {}
    ann_id = 1
    for img_id in range(1, n_images + 1):
        images.append({"id": img_id, "height": h, "width": w})
        n_gt = int(rng.integers(1, 7))
        gts, labels = [], []
        for _ in range(n_gt):
            cx, cy = rng.uniform(40, w - 40), rng.uniform(40, h - 40)
            bw, bh = rng.uniform(20, min(220, w // 3)), rng.uniform(20, min(220, h // 3))
            box = [
                max(0.0, cx - bw / 2), max(0.0, cy - bh / 2),
                min(float(w), cx + bw / 2), min(float(h), cy + bh / 2),
            ]
            cat = int(rng.integers(1, n_classes + 1))
            gts.append(box)
            labels.append(cat)
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": cat,
                "bbox": [box[0], box[1], box[2] - box[0], box[3] - box[1]],
                "area": (box[2] - box[0]) * (box[3] - box[1]), "iscrowd": 0,
            })
            ann_id += 1
        gt_by_image[img_id] = (np.asarray(gts, np.float32), labels)

    def gen(img_id):
        g = np.random.default_rng([seed, img_id])
        gts_np, labels = gt_by_image[img_id]
        cls = g.normal(-8.0, 0.3, size=(A, n_classes)).astype(np.float32)
        reg = g.normal(0.0, 0.05, size=(A, 4)).astype(np.float32)
        m = np.asarray(
            ops.match_anchors(anchors, gts_np, np.ones(len(gts_np), bool)).matches
        )
        matched = np.nonzero(m >= 0)[0]
        if len(matched):
            tgt = encode_boxes_torch(
                torch.from_numpy(gts_np[m[matched]]),
                torch.from_numpy(anchors[matched]),
            ).numpy()
            reg[matched] = tgt + g.normal(0, 0.05, tgt.shape).astype(np.float32)
            conf = g.uniform(0.55, 0.95, len(matched))
            for a_i, c in zip(matched, conf):
                cat = labels[m[a_i]]
                cls[a_i, cat - 1] = np.log(c / (1 - c))
        d_idx = g.choice(A, 150, replace=False)
        cls[d_idx, g.integers(0, n_classes, 150)] = g.uniform(-3.0, 0.5, 150)
        return cls, reg

    gt_index = COCOIndex({
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": str(c)} for c in range(1, n_classes + 1)],
    })
    return anchors, gt_index, gen


def eval_pipeline(gt_index, preds) -> float:
    ev = CocoEvaluator(gt_index, ["bbox"])
    ev.update(preds)
    ev.accumulate()
    return float(ev.summarize(verbose=False)["bbox"][0])


def unpack(det):
    det = jax.device_get(det)
    n = int(np.asarray(det.valid).sum())
    return {
        "boxes": np.asarray(det.boxes)[:n],
        "scores": np.asarray(det.scores)[:n],
        "labels": np.asarray(det.labels)[:n],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=50)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--size", default="256x256", help="HxW, e.g. 800x1344")
    ap.add_argument("--append", action="store_true",
                    help="append a section instead of overwriting the report")
    ap.add_argument("--skip-exhaustive", action="store_true",
                    help="skip the full-candidate variant (A*C top-k)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "PARITY_REPORT.md"))
    args = ap.parse_args()
    image_size = tuple(int(v) for v in args.size.split("x"))
    on_tpu = jax.default_backend() == "tpu"

    anchors, gt_index, gen = make_val_set(args.images, args.classes, image_size)
    per_level = ops.generate_anchors_per_level(image_size)
    splits = np.cumsum([len(a) for a in per_level])[:-1]
    size = np.asarray(image_size, np.float32)

    # One jitted program per variant (eager per-op dispatch over a remote
    # backend would dominate the wall time at production scale).
    @functools.partial(jax.jit, static_argnames=("approx", "pallas"))
    def ours_ml(cls, reg, approx, pallas):
        import jax.numpy as jnp

        return ops.process_detections_multilevel(
            jnp.split(cls, splits), jnp.split(reg, splits),
            per_level, size, use_pallas=pallas, approx_top_k=approx,
        )

    @jax.jit
    def ours_flat(cls, reg):
        # 4096 slots cover every above-0.05 candidate the generator plants
        # (~400/image) — exhaustive in effect without an [A*C]^2 IoU matrix.
        return ops.process_detections(
            cls, reg, anchors, size, pre_nms_top_k=4096, use_pallas=False
        )

    names = ["torch-oracle (reference)"]
    fns = {}
    if not args.skip_exhaustive:
        names.append("ours exact full-candidates")
        fns["ours exact full-candidates"] = lambda c, r: unpack(ours_flat(c, r))
    names += ["ours exact top-1000/level", "ours approx top-1000/level"]
    fns["ours exact top-1000/level"] = lambda c, r: unpack(ours_ml(c, r, approx=False, pallas=False))
    fns["ours approx top-1000/level"] = lambda c, r: unpack(ours_ml(c, r, approx=True, pallas=False))
    if on_tpu:
        names.append("ours approx + Pallas NMS (compiled)")
        fns["ours approx + Pallas NMS (compiled)"] = (
            lambda c, r: unpack(ours_ml(c, r, approx=True, pallas=True))
        )

    def oracle(cls, reg):
        det = process_detections_torch(
            torch.from_numpy(cls), torch.from_numpy(reg),
            torch.from_numpy(np.asarray(anchors)), image_size,
        )
        return {k: v.numpy() for k, v in det.items()}

    fns["torch-oracle (reference)"] = oracle

    # Outer loop over images so each image's [A, C] head output exists once.
    preds = {name: {} for name in names}
    times = {name: 0.0 for name in names}
    for img_id in range(1, args.images + 1):
        cls, reg = gen(img_id)
        for name in names:
            t0 = time.time()
            preds[name][img_id] = fns[name](cls, reg)
            times[name] += time.time() - t0
        if img_id % 10 == 0:
            print(f"  image {img_id}/{args.images}")

    variants = {}
    for name in names:
        ap_val = eval_pipeline(gt_index, preds[name])
        variants[name] = (ap_val, times[name])
        print(f"{name:36s} AP={ap_val:.4f}  ({times[name]:.1f}s)")

    base_ap = variants["torch-oracle (reference)"][0]
    a_total = anchors.shape[0]
    lines = [
        f"## {image_size[0]}x{image_size[1]}, {args.classes} classes, "
        f"{args.images} images (A={a_total:,}, backend={jax.default_backend()})",
        "",
        "All pipelines consume IDENTICAL per-image head outputs; differences "
        "isolate the postprocess (tools/parity_report.py).",
        "",
        "| pipeline | AP@[.5:.95] | ΔAP vs oracle |",
        "|---|---|---|",
    ]
    for name, (ap_val, _) in variants.items():
        lines.append(f"| {name} | {ap_val:.4f} | {ap_val - base_ap:+.4f} |")
    lines.append("")

    header = [
        "# Detection parity report (measured)",
        "",
        "Synthetic COCO-style val sets with planted noisy detections; decode",
        "semantics: both the oracle and the framework invert the reference's",
        "training-time encoder (bbox_2_activ, box_utils.py:25-34); the",
        "reference's activ_2_bbox slicing bug (box_utils.py:46) is NOT",
        "reproduced — documented deviation (SURVEY.md §6).",
        "",
    ]
    out_path = os.path.abspath(args.out)
    if args.append and os.path.exists(out_path):
        with open(out_path, "a") as f:
            f.write("\n" + "\n".join(lines) + "\n")
    else:
        with open(out_path, "w") as f:
            f.write("\n".join(header + lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
