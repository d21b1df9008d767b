"""Per-stage BACKWARD decomposition of the train step → ROOFLINE_TRAIN.md §2.

Round-4 verdict: the backward pass is 62% of the train step (176.8 ms at
bs16) and had never been directly profiled — the "HBM-bound, no headroom"
claim was inferred from the forward roofline. This measures it stage by
stage with nested grad cuts:

  for each prefix P in {stem, layer1..layer4, fpn, head, +loss}:
      time  fwd_P   = jit(scalar(prefix forward))
      time  grad_P  = jit(value_and_grad(scalar(prefix forward)))
  backward_delta(stage k) = (grad_k - grad_{k-1}) - (fwd_k - fwd_{k-1})

Prefixes reuse the FULL production ``module.apply`` with
``capture_intermediates``: the cut returns only the captured intermediate,
so XLA dead-code-eliminates everything downstream of it — including its
backward (the profile_backbone.py method, extended through ``jax.grad``).
The cotangent seeded at the cut is all-ones (sum), which is shape- and
traffic-identical to a real cotangent.

Per-stage backward FLOPs use the standard conv estimate: dW + dX each cost
one forward's worth of MACs (2x fwd), except the stem where dX of the
conv-from-pixels is dead (1x fwd + BN tail). Matches the backward of the
reference's ``retinanet/backbone.py:83-136`` + ``losses.py:113-145``.

Run on the TPU host: ``python tools/profile_backward.py [--batch 16]``
Writes/updates the marked "Backward decomposition" section of
docs/ROOFLINE_TRAIN.md and appends one JSON line to BACKWARD_PROFILE.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_retinanet_tpu.utils import enable_compilation_cache

enable_compilation_cache()

PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))
# v5e HBM bandwidth (GB/s) for the bandwidth-bound columns.
HBM_GBPS = float(os.environ.get("HBM_GBPS", "819"))

SECTION_BEGIN = "<!-- BACKWARD_DECOMP_BEGIN -->"
SECTION_END = "<!-- BACKWARD_DECOMP_END -->"


def time_scalar(fn, *args, iters=10):
    """fn must already return a scalar; scalar-forced timing (CLAUDE.md)."""
    g = jax.jit(fn)
    float(jax.device_get(g(*args)))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    args = ap.parse_args()

    from profile_backbone import stage_flops_bytes

    from pytorch_retinanet_tpu.models import RetinaNetModule
    from pytorch_retinanet_tpu.ops import (
        generate_anchors_per_level,
        retinanet_loss_levels,
    )
    from pytorch_retinanet_tpu.utils.flops import fpn_flops, head_flops

    h, w = args.height, args.width
    B = args.batch
    num_classes = 90
    max_gt = 100
    module = RetinaNetModule(backbone_kind="resnet50", num_classes=num_classes)
    images0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), images0)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level((h, w))]

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
    labels = jnp.asarray(rng.integers(1, num_classes + 1, (B, max_gt)), jnp.int32)
    valid = jnp.asarray(np.arange(max_gt)[None] < n_gt, bool).repeat(B, 0)

    # --- prefix programs: full apply + capture filter, return only the cut ---
    filters = {
        "stem": lambda mdl, _m: mdl.name == "stem_bn",
        "layer1": lambda mdl, _m: mdl.name == "layer1_block2",
        "layer2": lambda mdl, _m: mdl.name == "layer2_block3",
        "layer3": lambda mdl, _m: mdl.name == "layer3_block5",
        "layer4": lambda mdl, _m: mdl.name == "layer4_block2",
        "fpn": lambda mdl, _m: mdl.name == "fpn",
    }

    def capture_scalar(name):
        def f(p, im):
            _, st = module.apply(
                {"params": p, "batch_stats": batch_stats}, im, False,
                capture_intermediates=filters[name], mutable=["intermediates"],
            )
            leaves = jax.tree_util.tree_leaves(st["intermediates"])
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        return f

    def head_scalar(p, im):
        cls_levels, box_levels = module.apply(
            {"params": p, "batch_stats": batch_stats}, im, False,
            return_levels=True,
        )
        return sum(jnp.sum(c.astype(jnp.float32)) for c in cls_levels) + sum(
            jnp.sum(b.astype(jnp.float32)) for b in box_levels
        )

    def loss_scalar(p, im, boxes, labels, valid):
        cls_levels, box_levels = module.apply(
            {"params": p, "batch_stats": batch_stats}, im, False,
            return_levels=True,
        )
        losses = retinanet_loss_levels(
            cls_levels, box_levels, anchors_levels, boxes, labels, valid,
            num_classes=num_classes,
        )
        return losses["classification_loss"] + losses["regression_loss"]

    cuts = ["stem", "layer1", "layer2", "layer3", "layer4", "fpn", "head", "loss"]

    def fwd_fn(name):
        if name == "head":
            return head_scalar, (params, x)
        if name == "loss":
            return loss_scalar, (params, x, boxes, labels, valid)
        return capture_scalar(name), (params, x)

    def grad_fn(name):
        base, fargs = fwd_fn(name)

        def g(*a):
            val, grads = jax.value_and_grad(base)(*a)
            gsum = sum(
                jnp.sum(jnp.abs(l).astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(grads)
            )
            # 1e-30: keep the grads live without perturbing val at f32.
            return val + jnp.float32(1e-30) * gsum

        return g, fargs

    fwd_t, grad_t = {}, {}
    for name in cuts:
        fn, fargs = fwd_fn(name)
        fwd_t[name] = time_scalar(fn, *fargs, iters=args.iters)
        print(f"fwd  {name}: {fwd_t[name]*1e3:8.2f} ms", flush=True)
    for name in cuts:
        fn, fargs = grad_fn(name)
        grad_t[name] = time_scalar(fn, *fargs, iters=args.iters)
        print(f"grad {name}: {grad_t[name]*1e3:8.2f} ms", flush=True)

    # --- analytic per-stage FLOPs/bytes ---
    bb = stage_flops_bytes(h, w, B)  # {stage: (flops, bytes)} forward
    fpn_fl = fpn_flops(h, w) * B
    head_fl = head_flops(h, w, num_classes=num_classes) * B
    fwd_fl = {
        "stem": bb["stem"][0],
        "layer1": bb["layer1"][0],
        "layer2": bb["layer2"][0],
        "layer3": bb["layer3"][0],
        "layer4": bb["layer4"][0],
        "fpn": fpn_fl,
        "head": head_fl,
        "loss": 0,
    }
    fwd_by = {
        "stem": bb["stem"][1],
        "layer1": bb["layer1"][1],
        "layer2": bb["layer2"][1],
        "layer3": bb["layer3"][1],
        "layer4": bb["layer4"][1],
        "fpn": 0,
        "head": 0,
        "loss": 0,
    }
    # backward FLOPs: dX + dW = 2x fwd; stem has no dX (input is data).
    bwd_mult = {name: 2.0 for name in cuts}
    bwd_mult["stem"] = 1.0
    bwd_mult["loss"] = 0.0

    rows = []
    prev_f = prev_g = 0.0
    for name in cuts:
        dfwd = fwd_t[name] - prev_f
        dgrad = grad_t[name] - prev_g
        dbwd = dgrad - dfwd
        prev_f, prev_g = fwd_t[name], grad_t[name]
        bfl = fwd_fl[name] * bwd_mult[name]
        # backward activation traffic, conservative: read saved activations +
        # write dX (≈2x the forward's activation bytes) + dW read/write.
        bby = 2 * fwd_by[name]
        tflops = bfl / dbwd / 1e12 if dbwd > 1e-6 else 0.0
        gbps = bby / dbwd / 1e9 if dbwd > 1e-6 else 0.0
        rows.append(
            {
                "stage": name,
                "fwd_delta_ms": round(dfwd * 1e3, 2),
                "bwd_delta_ms": round(dbwd * 1e3, 2),
                "bwd_gflop": round(bfl / 1e9, 1),
                "bwd_tflops": round(tflops, 1),
                "bwd_mfu": round(tflops / PEAK_TFLOPS, 3),
                "bwd_est_gbps": round(gbps, 0),
            }
        )

    total_bwd = grad_t["loss"] - fwd_t["loss"]
    total_bfl = sum(fwd_fl[n] * bwd_mult[n] for n in cuts)

    lines = [
        SECTION_BEGIN,
        "",
        "## Backward decomposition (nested grad cuts)",
        "",
        f"batch={B}, backend={jax.default_backend()}, "
        f"peak={PEAK_TFLOPS:.0f} bf16 TFLOP/s, HBM={HBM_GBPS:.0f} GB/s. "
        "Each row: prefix-grad minus previous prefix-grad, minus the same "
        "stage's forward delta (tools/profile_backward.py; cuts are "
        "DCE-truncated prefixes of the production program).",
        "",
        "| stage | fwd Δms | bwd Δms | bwd GFLOP | bwd TFLOP/s | bwd MFU |"
        " est GB/s |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['stage']} | {r['fwd_delta_ms']:.1f} | {r['bwd_delta_ms']:.1f} "
            f"| {r['bwd_gflop']:.0f} | {r['bwd_tflops']:.1f} | "
            f"{r['bwd_mfu']:.1%} | {r['bwd_est_gbps']:.0f} |"
        )
    lines += [
        "",
        f"Total backward {total_bwd*1e3:.1f} ms for {total_bfl/1e9:.0f} GFLOP "
        f"→ {total_bfl/total_bwd/1e12:.1f} TFLOP/s "
        f"({total_bfl/total_bwd/1e12/PEAK_TFLOPS:.1%} MFU). "
        "Backward FLOPs are the standard dX+dW = 2x-forward conv estimate "
        "(stem 1x: dX of the conv-from-pixels is dead). est GB/s charges 2x "
        "the forward's activation traffic (saved activations + dX).",
        "",
        SECTION_END,
    ]
    section = "\n".join(lines)

    out_path = os.path.join(
        os.path.dirname(__file__), "..", "docs", "ROOFLINE_TRAIN.md"
    )
    try:
        with open(out_path) as f:
            doc = f.read()
    except OSError:
        doc = "# Train-step roofline\n"
    if SECTION_BEGIN in doc:
        doc = re.sub(
            re.escape(SECTION_BEGIN) + r".*?" + re.escape(SECTION_END),
            section,
            doc,
            flags=re.S,
        )
    else:
        doc = doc.rstrip() + "\n\n" + section + "\n"
    with open(out_path, "w") as f:
        f.write(doc)

    record = {
        "batch": B,
        "hw": [h, w],
        "backend": jax.default_backend(),
        "total_bwd_ms": round(total_bwd * 1e3, 2),
        "rows": rows,
    }
    jsonl = os.path.join(os.path.dirname(__file__), "..", "BACKWARD_PROFILE.jsonl")
    with open(jsonl, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
