"""Fine-grained postprocess profile: where do the ~20 ms/batch go?

Times cumulative cuts of ops.nms.process_detections_multilevel_batch on
random head-shaped logits (no model needed — postprocess depends only on the
head outputs), so each delta isolates one sub-stage:

  stage1   per-level class-max + (approx) top-k over anchors
  stage2   + gather selected rows, exact top-k over (anchor, class) pairs
  merge    + decode, cross-level concat, global top-k, sigmoid, clip
  nms      + class-offset NMS (Pallas on TPU)
  pack     + final top-k pack (== full production postprocess)

Run on the TPU host: ``python tools/profile_post.py [--batch 16]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_retinanet_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def time_fn(fn, *args, iters=30):
    @jax.jit
    def g(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    float(jax.device_get(g(*args)))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--no-approx", action="store_true")
    args = ap.parse_args()

    from pytorch_retinanet_tpu.config import PRE_NMS_TOP_K, SCORE_THRES
    from pytorch_retinanet_tpu.ops import generate_anchors_per_level
    from pytorch_retinanet_tpu.ops.boxes import clip_boxes, decode_boxes, small_box_mask
    from pytorch_retinanet_tpu.ops.nms import (
        _suppress_and_pack,
        process_detections_multilevel_batch,
    )

    h, w = 800, 1344
    B, C, A = args.batch, 90, 9
    approx = not args.no_approx
    k_top = PRE_NMS_TOP_K
    anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level((h, w))]
    rng = np.random.default_rng(0)
    cls_levels, box_levels = [], []
    for s in (8, 16, 32, 64, 128):
        a_l = (h // s) * (w // s) * A
        # logits ~ N(-4, 2): realistic sparse-positive regime (~2% above 0.05)
        cls_levels.append(
            jnp.asarray(rng.normal(-4.0, 2.0, (B, a_l, C)).astype(np.float32)).astype(
                jnp.bfloat16
            )
        )
        box_levels.append(
            jnp.asarray(rng.normal(0.0, 0.3, (B, a_l, 4)).astype(np.float32)).astype(
                jnp.bfloat16
            )
        )
    sizes = jnp.tile(jnp.asarray([[800.0, 1333.0]], jnp.float32), (B, 1))

    def stage1_one(cls_l):
        out = []
        for x, anc in zip(cls_l, anchors_levels):
            a_l = x.shape[0]
            k_anchors = min(k_top, a_l)
            anchor_max = jnp.max(x, axis=-1)
            if approx and a_l > 4 * k_anchors:
                _, a_idx = jax.lax.approx_max_k(anchor_max, k_anchors)
            else:
                _, a_idx = jax.lax.top_k(anchor_max, k_anchors)
            out.append(a_idx)
        return out

    def stage2_one(cls_l):
        # Mirrors ops.nms.process_detections_multilevel's hybrid: large
        # levels gather the stage-1 anchors' rows; small levels (P6/P7)
        # select directly over the full [A_l*C] pair space, gather-free.
        a_idxs = stage1_one(cls_l)
        out = []
        for x, a_idx in zip(cls_l, a_idxs):
            a_l = x.shape[0]
            if approx and a_l > 4 * min(k_top, a_l):
                rows = jnp.take(x, a_idx, axis=0, unique_indices=True).astype(
                    jnp.float32
                )
                flat = rows.reshape(-1)
                k_l = min(k_top, flat.shape[0])
                s_l, idx_l = jax.lax.approx_max_k(flat, k_l)
                out.append((s_l, a_idx[idx_l // C], (idx_l % C).astype(jnp.int32)))
                continue
            flat = x.reshape(-1).astype(jnp.float32)
            k_l = min(k_top, flat.shape[0])
            if approx and flat.shape[0] > 4 * k_l:
                s_l, idx_l = jax.lax.approx_max_k(flat, k_l)
            else:
                s_l, idx_l = jax.lax.top_k(flat, k_l)
            out.append((s_l, idx_l // C, (idx_l % C).astype(jnp.int32)))
        return out

    def merge_one(cls_l, box_l, size):
        sel = stage2_one(cls_l)
        ss, bs, cs = [], [], []
        for (s_l, sel_anchor, c_idx), box, anc in zip(sel, box_l, anchors_levels):
            b_l = decode_boxes(box.astype(jnp.float32)[sel_anchor], anc[sel_anchor])
            ss.append(s_l)
            bs.append(b_l)
            cs.append(c_idx)
        scores_all = jnp.concatenate(ss)
        k = min(k_top, scores_all.shape[0])
        top_logits, top_idx = jax.lax.top_k(scores_all, k)
        top_scores = jax.nn.sigmoid(top_logits)
        boxes = clip_boxes(jnp.concatenate(bs)[top_idx], size)
        class_idx = jnp.concatenate(cs)[top_idx]
        valid = (top_scores > SCORE_THRES) & small_box_mask(boxes)
        return boxes, top_scores, class_idx, valid

    def full_one(cls_l, box_l, size):
        boxes, scores, class_idx, valid = merge_one(cls_l, box_l, size)
        return _suppress_and_pack(
            boxes, scores, class_idx, valid,
            nms_thres=0.5, max_detections=100, max_coordinate=4096.0,
            use_pallas=None,
        )

    n = len(cls_levels)

    def batched(per_image):
        def f(*arrays):
            cls_l = arrays[:n]
            box_l = arrays[n : 2 * n]
            size = arrays[-1]

            def one(args):
                if per_image is stage1_one or per_image is stage2_one:
                    return per_image(args[:n])
                return per_image(args[:n], args[n : 2 * n], args[-1])

            return jax.vmap(one)(tuple(cls_l) + tuple(box_l) + (size,))

        return f

    arrays = tuple(cls_levels) + tuple(box_levels) + (sizes,)
    cuts = {}
    cuts["stage1 (class-max + anchor top-k)"] = time_fn(
        batched(stage1_one), *arrays, iters=args.iters
    )
    cuts["stage2 (+pair top-k)"] = time_fn(batched(stage2_one), *arrays, iters=args.iters)
    cuts["merge (+decode/global top-k)"] = time_fn(
        batched(merge_one), *arrays, iters=args.iters
    )
    cuts["full (+NMS+pack)"] = time_fn(batched(full_one), *arrays, iters=args.iters)

    def prod_fn(*arrays):
        return process_detections_multilevel_batch(
            list(arrays[:n]), list(arrays[n : 2 * n]), anchors_levels, arrays[-1],
            approx_top_k=approx,
        )

    cuts["production (sanity)"] = time_fn(prod_fn, *arrays, iters=args.iters)

    prev = 0.0
    print(f"batch={B} backend={jax.default_backend()} approx={approx}")
    print("| cut | ms/batch | delta ms |")
    print("|---|---|---|")
    for name, t in cuts.items():
        d = t * 1e3 - prev if "sanity" not in name else 0.0
        print(f"| {name} | {t*1e3:.2f} | {d:+.2f} |")
        if "sanity" not in name:
            prev = t * 1e3
    print(json.dumps({k: round(v * 1e3, 2) for k, v in cuts.items()}))


if __name__ == "__main__":
    main()
