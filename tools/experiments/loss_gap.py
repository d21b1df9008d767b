"""Bisect the in-program LOSS cost: logit consumption vs matcher vs tail.

The round-5 backward decomposition charged the loss stage 19.6 ms forward
+ 18.3 ms backward in-program at bs16 — vs 8.1 + 3.2 ms standalone at the
same shapes (MATCH_KERNEL_AB.jsonl). The inference-side twin of this gap
(the select cut) was bisected to the cost of consuming the [B, A, C]
logits outside the conv fusion domain (SELECT_GAP/SELECT_PAD_AB). This
splits the training loss the same way, with cuts INSIDE the full program
(head kept fully live via a box-sum in every cut):

  fwd          per-level head outputs, scalar epilogue
  fwd+focal    + sigmoid focal vs CONSTANT random targets, per-level sums
               (pure logit consumption + focal math; no matcher)
  fwd+match    + matcher/targets only (IoU + thresholds + one-hot-matmul
               encode; depends on anchors+GT, NOT on head outputs — can
               overlap the trunk)
  fwd+loss     + the full production per-level loss

and grad twins of fwd / fwd+focal / fwd+loss (value_and_grad wrt params).

Run on the TPU host: python tools/experiments/loss_gap.py [--batch 16]
Appends one JSON line to tools/experiments/LOSS_GAP.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_retinanet_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def time_scalar(fn, *args, iters=10):
    g = jax.jit(fn)
    float(jax.device_get(g(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from pytorch_retinanet_tpu.models import RetinaNetModule
    from pytorch_retinanet_tpu.ops import (
        generate_anchors_per_level,
        retinanet_loss_levels,
    )
    from pytorch_retinanet_tpu.ops.losses import sigmoid_focal_loss
    from pytorch_retinanet_tpu.ops.matcher import match_anchors_batch

    h, w = 800, 1344
    B, nc, max_gt = args.batch, 90, 100
    module = RetinaNetModule(backbone_kind="resnet50", num_classes=nc)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]
    anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level((h, w))]
    anchors_all = jnp.concatenate(anchors_levels, axis=0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, h, w, 3), np.float32))
    n_gt = 20
    cx = rng.uniform(100, w - 150, (B, max_gt, 1))
    cy = rng.uniform(100, h - 100, (B, max_gt, 1))
    bw = rng.uniform(20, 300, (B, max_gt, 1))
    bh = rng.uniform(20, 300, (B, max_gt, 1))
    boxes = jnp.asarray(
        np.concatenate([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(1, nc + 1, (B, max_gt)), jnp.int32)
    valid = jnp.asarray(np.arange(max_gt)[None] < n_gt, bool).repeat(B, 0)
    # Fixed random focal targets, one per level. Passed as ARGUMENTS, not
    # closure constants: baked-in [B, A_l, C] literals made the remote
    # compile request exceed its body limit (HTTP 413).
    tgt_levels = tuple(
        jnp.asarray((rng.random((B, a.shape[0], nc)) < 0.01).astype(np.float32))
        for a in anchors_levels
    )

    def apply_levels(p, im):
        return module.apply(
            {"params": p, "batch_stats": batch_stats}, im, False, return_levels=True
        )

    def fwd(p, im):
        cls_l, box_l = apply_levels(p, im)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in cls_l) + sum(
            jnp.sum(l.astype(jnp.float32)) for l in box_l
        )

    def fwd_focal(p, im, *tgts):
        cls_l, box_l = apply_levels(p, im)
        keep_box = sum(jnp.sum(l.astype(jnp.float32)) for l in box_l)
        f = sum(
            jnp.sum(sigmoid_focal_loss(c.astype(jnp.float32), t))
            for c, t in zip(cls_l, tgts)
        )
        return keep_box + f

    def fwd_match(p, im):
        cls_l, box_l = apply_levels(p, im)
        keep = sum(jnp.sum(l.astype(jnp.float32)) for l in cls_l) + sum(
            jnp.sum(l.astype(jnp.float32)) for l in box_l
        )
        m = match_anchors_batch(anchors_all, boxes, valid)
        return keep + jnp.sum(m.matches.astype(jnp.float32)) + jnp.sum(m.max_iou)

    def fwd_loss(p, im):
        cls_l, box_l = apply_levels(p, im)
        losses = retinanet_loss_levels(
            cls_l, box_l, anchors_levels, boxes, labels, valid, num_classes=nc
        )
        return losses["classification_loss"] + losses["regression_loss"]

    def with_grad(base):
        def g(p, im, *rest):
            val, grads = jax.value_and_grad(base)(p, im, *rest)
            gsum = sum(
                jnp.sum(jnp.abs(l).astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(grads)
            )
            return val + jnp.float32(1e-30) * gsum

        return g

    cuts = {
        "fwd": (fwd, (params, x)),
        "fwd_focal": (fwd_focal, (params, x) + tgt_levels),
        "fwd_match": (fwd_match, (params, x)),
        "fwd_loss": (fwd_loss, (params, x)),
    }
    times = {}
    for name, (fn, fargs) in cuts.items():
        times[name] = round(time_scalar(fn, *fargs, iters=args.iters) * 1e3, 2)
        print(f"{name}: {times[name]} ms", flush=True)
    for name in ("fwd", "fwd_focal", "fwd_loss"):
        key = f"grad_{name}"
        fn, fargs = cuts[name]
        times[key] = round(
            time_scalar(with_grad(fn), *fargs, iters=args.iters) * 1e3, 2
        )
        print(f"{key}: {times[key]} ms", flush=True)

    record = {
        "batch": B,
        "backend": jax.default_backend(),
        "ms": times,
        "deltas_ms": {
            "focal_fwd": round(times["fwd_focal"] - times["fwd"], 2),
            "match_fwd": round(times["fwd_match"] - times["fwd"], 2),
            "full_loss_fwd": round(times["fwd_loss"] - times["fwd"], 2),
            "focal_bwd": round(
                (times["grad_fwd_focal"] - times["grad_fwd"])
                - (times["fwd_focal"] - times["fwd"]),
                2,
            ),
            "full_loss_bwd": round(
                (times["grad_fwd_loss"] - times["grad_fwd"])
                - (times["fwd_loss"] - times["fwd"]),
                2,
            ),
        },
    }
    out = os.path.join(os.path.dirname(__file__), "LOSS_GAP.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
