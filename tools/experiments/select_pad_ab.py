"""A/B: pad the cls predictor to 128 classes/anchor to kill the select relayout.

tools/experiments/select_gap.py (round 5) pinned the 7.8 ms in-program
postprocess gap to the CLASS-MAX: +12.3 ms in-program vs ~2 ms standalone
at bs32. Cause hypothesis: the head's conv-layout output ([B, H, W, 9*90],
lane-tiled 810->896) has each anchor's 90-class group straddling lane
tiles, so the max-over-classes needs a relayout pass over the 1.16 GB
logits tensor.

If the predictor instead emits 9*128 = 1152 channels (38 dead classes per
anchor), every class group is exactly ONE 128-lane tile: the class-max is
an in-tile lane reduction, and the [B, A, 128] reshape is tile-aligned.
Price: the predictor matmul grows from 7 to 9 lane tiles (+28.6% on ~28%
of the head). This times both heads at bs32:

  fwd             per-level outputs, scalar epilogue
  fwd+classmax    + per-anchor class-max  (the relayout payer at C=90)
  fwd+select      + full stage-1 selection (multilevel_candidates)

For timing the C=128 module uses random init — identical compute graph to
the padded-weights transform (zero kernel columns / -1e9 bias on the pad
classes) that production would use, so the deltas transfer.

Run on the TPU host: python tools/experiments/select_pad_ab.py
Appends one JSON line to tools/experiments/SELECT_PAD_AB.jsonl.
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


def scalarize(fn):
    @jax.jit
    def g(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    return g


def time_fn(fn, *args, iters=20):
    fn = scalarize(fn)
    float(jax.device_get(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from pytorch_retinanet_tpu.models import RetinaNetModule
    from pytorch_retinanet_tpu.models.retinanet import apply_detector
    from pytorch_retinanet_tpu.ops import generate_anchors_per_level
    from pytorch_retinanet_tpu.ops.nms import multilevel_candidates

    h, w = 800, 1344
    B = args.batch
    anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level((h, w))]
    x = jnp.asarray(np.random.default_rng(0).random((B, h, w, 3), np.float32))

    record = {"batch": B, "backend": jax.default_backend(), "arms": {}}
    for nc in (90, 128):
        module = RetinaNetModule(backbone_kind="resnet50", num_classes=nc)
        variables = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32)
        )

        def fwd_only(v, im):
            return apply_detector(module, v, im, return_levels=True)

        def fwd_classmax(v, im):
            cls_levels, box_levels = apply_detector(module, v, im, return_levels=True)
            keep_box = sum(jnp.sum(b.astype(jnp.float32)) for b in box_levels)
            return [keep_box] + [jnp.max(c, axis=-1) for c in cls_levels]

        def fwd_select(v, im):
            cls_levels, box_levels = apply_detector(module, v, im, return_levels=True)

            def one(args_):
                n = len(cls_levels)
                return multilevel_candidates(args_[:n], args_[n:], anchors_levels)

            return jax.vmap(one)(tuple(cls_levels) + tuple(box_levels))

        arm = {}
        arm["fwd_ms"] = round(time_fn(fwd_only, variables, x, iters=args.iters) * 1e3, 2)
        print(f"nc={nc} fwd: {arm['fwd_ms']} ms", flush=True)
        arm["classmax_ms"] = round(
            time_fn(fwd_classmax, variables, x, iters=args.iters) * 1e3, 2
        )
        print(f"nc={nc} fwd+classmax: {arm['classmax_ms']} ms", flush=True)
        arm["select_ms"] = round(
            time_fn(fwd_select, variables, x, iters=args.iters) * 1e3, 2
        )
        print(f"nc={nc} fwd+select: {arm['select_ms']} ms", flush=True)
        arm["classmax_delta_ms"] = round(arm["classmax_ms"] - arm["fwd_ms"], 2)
        arm["select_delta_ms"] = round(arm["select_ms"] - arm["fwd_ms"], 2)
        record["arms"][str(nc)] = arm

    a90, a128 = record["arms"]["90"], record["arms"]["128"]
    record["e2e_delta_ms"] = round(a128["select_ms"] - a90["select_ms"], 2)
    record["img_per_sec"] = {
        "90": round(B / a90["select_ms"] * 1e3, 1),
        "128": round(B / a128["select_ms"] * 1e3, 1),
    }
    out = os.path.join(os.path.dirname(__file__), "SELECT_PAD_AB.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
