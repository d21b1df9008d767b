"""Bisect INSIDE the select stage: where do the in-program 23.5 ms go?

tools/profile_post_gap.py (round 5) localized the whole 7.8 ms in-program-
vs-standalone postprocess gap to the SELECT cut (23.5 vs 15.6 ms at bs32).
Hypothesis: the select is charged the relayout of the head's conv-layout
outputs ([B, H, W, A*C], lane-tiled 810->896) into the [B, A_l, C] rows the
top-k consumes — work the fwd-only baseline fuses away into its scalar sum.

Cuts (all DCE-truncated suffixes of the production select, inside the full
program, vmapped per image like production):

  fwd            apply_detector, per-level outputs, scalar-sum epilogue
  fwd+classmax   + anchor_max = max over C per level    (first select op)
  fwd+atopk      + approx_max_k over anchors
  fwd+gather     + row gather [k, C] + f32 cast
  fwd+select     + pair approx top-k (= full stage 1, the 23.5 ms cut)

Run on the TPU host: python tools/experiments/select_gap.py
Appends one JSON line to tools/experiments/SELECT_GAP.jsonl.
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
    from pytorch_retinanet_tpu.ops.nms import PRE_NMS_TOP_K, multilevel_candidates

    h, w = 800, 1344
    B = args.batch
    module = RetinaNetModule(backbone_kind="resnet50", num_classes=90)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level((h, w))]
    x = jnp.asarray(np.random.default_rng(0).random((B, h, w, 3), np.float32))

    def per_image_cut(kind):
        def cut(cls_levels, box_levels):
            # Keep the box subnet LIVE in every cut (sum its outputs):
            # without this, cls-only cuts let XLA DCE half the head and the
            # deltas mix select work with box-branch resurrection (the first
            # run of this script measured fwd+classmax FASTER than fwd).
            outs = [sum(jnp.sum(b.astype(jnp.float32)) for b in box_levels)]
            for cls_l in cls_levels:
                a_l = cls_l.shape[0]
                k = min(PRE_NMS_TOP_K, a_l)
                anchor_max = jnp.max(cls_l, axis=-1)
                if kind == "classmax":
                    outs.append(anchor_max)
                    continue
                if a_l > 4 * k:
                    vals, a_idx = jax.lax.approx_max_k(anchor_max, k)
                else:
                    vals, a_idx = jax.lax.top_k(anchor_max, k)
                if kind == "atopk":
                    outs.append(vals)
                    outs.append(a_idx)
                    continue
                rows = jnp.take(cls_l, a_idx, axis=0, unique_indices=True).astype(
                    jnp.float32
                )
                if kind == "gather":
                    outs.append(rows)
                    continue
                raise AssertionError(kind)
            return outs

        return cut

    def fused(kind):
        def f(v, im):
            cls_levels, box_levels = apply_detector(module, v, im, return_levels=True)
            return jax.vmap(per_image_cut(kind))(
                tuple(cls_levels), tuple(box_levels)
            )

        return f

    def fwd_only(v, im):
        return apply_detector(module, v, im, return_levels=True)

    def full_select(v, im):
        cls_levels, box_levels = apply_detector(module, v, im, return_levels=True)

        def one(args_):
            n = len(cls_levels)
            return multilevel_candidates(args_[:n], args_[n:], anchors_levels)

        return jax.vmap(one)(tuple(cls_levels) + tuple(box_levels))

    results = {}
    results["fwd"] = time_fn(fwd_only, variables, x, iters=args.iters)
    print(f"fwd: {results['fwd']*1e3:.2f} ms", flush=True)
    for kind in ["classmax", "atopk", "gather"]:
        results[kind] = time_fn(fused(kind), variables, x, iters=args.iters)
        print(f"fwd+{kind}: {results[kind]*1e3:.2f} ms", flush=True)
    results["select"] = time_fn(full_select, variables, x, iters=args.iters)
    print(f"fwd+select: {results['select']*1e3:.2f} ms", flush=True)

    record = {
        "batch": B,
        "backend": jax.default_backend(),
        "ms": {k: round(v * 1e3, 2) for k, v in results.items()},
        "deltas_ms": {
            "classmax": round((results["classmax"] - results["fwd"]) * 1e3, 2),
            "atopk": round((results["atopk"] - results["classmax"]) * 1e3, 2),
            "gather": round((results["gather"] - results["atopk"]) * 1e3, 2),
            "pair_topk_decode": round((results["select"] - results["gather"]) * 1e3, 2),
        },
    }
    out = os.path.join(os.path.dirname(__file__), "SELECT_GAP.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
