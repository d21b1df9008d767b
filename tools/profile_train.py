"""Stage-level TRAIN-step profile + roofline table → docs/ROOFLINE_TRAIN.md.

Times nested cuts of the R50-FPN 800px training step on the real chip:

  fwd+loss     forward pass + fused matcher/focal/smooth-L1 loss
  grad         + backward pass (value_and_grad)
  step         + gradient clip + SGD update (== production train step)

and reports achieved TFLOP/s + MFU against the chip's bf16 peak, with
analytic conv FLOPs (backward ≈ 2x forward for conv nets: dX and dW each
cost one forward's worth of MACs).

Run on the TPU host: ``python tools/profile_train.py [--batch 8]``
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

PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))


def time_fn(fn, *args, iters=10):
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "ROOFLINE_TRAIN.md"))
    args = ap.parse_args()

    import optax

    from profile_infer import fpn_flops, head_flops, resnet50_flops

    from pytorch_retinanet_tpu.models import RetinaNetModule
    from pytorch_retinanet_tpu.ops import (
        generate_anchors,
        generate_anchors_per_level,
        retinanet_loss_levels,
    )

    h, w = 800, 1344
    B = args.batch
    num_classes = 90
    max_gt = 100
    module = RetinaNetModule(
        backbone_kind="resnet50", num_classes=num_classes, remat=args.remat
    )
    images0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), images0)
    params = variables["params"]
    anchors = jnp.asarray(generate_anchors((h, w)))
    anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level((h, w))]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, h, w, 3), np.float32))
    n_gt = 20
    cx = rng.uniform(100, 1200, (B, max_gt, 1))
    cy = rng.uniform(100, 700, (B, max_gt, 1))
    bw = rng.uniform(20, 300, (B, max_gt, 1))
    bh = rng.uniform(20, 300, (B, max_gt, 1))
    boxes = jnp.asarray(
        np.concatenate([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(1, num_classes + 1, (B, max_gt)), jnp.int32)
    valid = jnp.asarray(np.arange(max_gt)[None] < n_gt, bool).repeat(B, 0)

    tx = optax.sgd(0.001, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(params, x, boxes, labels, valid):
        # per-level outputs + per-level loss — mirrors Trainer's train_step
        cls_levels, box_levels = module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x, False,
            return_levels=True,
        )
        losses = retinanet_loss_levels(
            cls_levels, box_levels, anchors_levels, boxes, labels, valid,
            num_classes=num_classes,
        )
        return losses["classification_loss"] + losses["regression_loss"]

    def fwd(params, x, boxes, labels, valid):
        return loss_fn(params, x, boxes, labels, valid)

    def fwd_only(params, x):
        # Forward WITHOUT the loss — isolates the fused matcher/focal/
        # smooth-L1 cost as a delta (round 4; it had only ever been
        # bundled into fwd+loss).
        cls_levels, box_levels = module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x,
            False, return_levels=True,
        )
        return (
            sum(jnp.sum(c.astype(jnp.float32)) for c in cls_levels)
            + sum(jnp.sum(b.astype(jnp.float32)) for b in box_levels)
        )

    def grad(params, x, boxes, labels, valid):
        return jax.value_and_grad(loss_fn)(params, x, boxes, labels, valid)

    def step(params, opt_state, x, boxes, labels, valid):
        total, grads = jax.value_and_grad(loss_fn)(params, x, boxes, labels, valid)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, 0.5 / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, total

    stages = {}
    stages["fwd_only"] = time_fn(fwd_only, params, x, iters=args.iters)
    stages["fwd+loss"] = time_fn(fwd, params, x, boxes, labels, valid, iters=args.iters)
    stages["grad"] = time_fn(grad, params, x, boxes, labels, valid, iters=args.iters)
    stages["step"] = time_fn(
        step, params, opt_state, x, boxes, labels, valid, iters=args.iters
    )

    fwd_fl = (resnet50_flops(h, w) + fpn_flops(h, w) + head_flops(h, w)) * B
    rows = [
        ("fwd (no loss)", stages["fwd_only"], fwd_fl),
        ("loss (delta)", stages["fwd+loss"] - stages["fwd_only"], 0),
        ("fwd+loss", stages["fwd+loss"], fwd_fl),
        ("backward (delta)", stages["grad"] - stages["fwd+loss"], 2 * fwd_fl),
        ("optimizer (delta)", stages["step"] - stages["grad"], 0),
        ("TOTAL train step", stages["step"], 3 * fwd_fl),
    ]
    lines = [
        "<!-- TRAIN_TABLE_BEGIN -->",
        "# Train-step roofline — R50-FPN, 800x1344, one chip",
        "",
        f"batch={B}, remat={args.remat}, backend={jax.default_backend()}, "
        f"device={jax.devices()[0]}, peak={PEAK_TFLOPS:.0f} bf16 TFLOP/s.",
        "",
        "| stage | ms/step | GFLOP | TFLOP/s | MFU |",
        "|---|---|---|---|---|",
    ]
    for name, t, f in rows:
        tflops = f / t / 1e12 if t > 0 else 0.0
        lines.append(
            f"| {name} | {t*1e3:.1f} | {f/1e9:.0f} | {tflops:.1f} | "
            f"{tflops/PEAK_TFLOPS:.1%} |"
        )
    lines += [
        "",
        f"Throughput: **{B/stages['step']:.1f} img/s/chip** "
        f"(loss matcher/focal over {anchors.shape[0]} anchors included in fwd).",
        "",
        "Backward FLOPs are the standard 2x-forward conv estimate (dX + dW).",
        "",
        "Generated by tools/profile_train.py.",
        "<!-- TRAIN_TABLE_END -->",
    ]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    # Splice into the marked header region so the hand-written
    # interpretation sections below it survive re-runs (the pre-round-5
    # whole-file overwrite nearly clobbered them).
    section = "\n".join(lines)
    try:
        with open(args.out) as f:
            doc = f.read()
    except OSError:
        doc = ""
    begin, end = "<!-- TRAIN_TABLE_BEGIN -->", "<!-- TRAIN_TABLE_END -->"
    if begin in doc and end in doc:
        import re as _re

        doc = _re.sub(
            _re.escape(begin) + r".*?" + _re.escape(end), section, doc, flags=_re.S
        )
    elif doc.startswith("# Train-step roofline"):
        # Legacy layout: generated header ran until the first section break.
        head, sep, rest = doc.partition("\n## ")
        doc = section + ("\n\n## " + rest if sep else "\n")
    else:
        doc = section + "\n\n" + doc
    with open(args.out, "w") as f:
        f.write(doc)
    print("\n".join(lines[4:]))
    print(json.dumps({"img_per_sec": round(B / stages["step"], 2)}))


if __name__ == "__main__":
    main()
