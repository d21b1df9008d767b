"""A/B the loss-target path: XLA matcher composition vs the Pallas kernel.

kernels/match_pallas.py claims the XLA matcher + one-hot lookup + encode
materializes [B, A, N]-sized HBM intermediates (~16 GB of traffic at bs16)
that the VMEM kernel eliminates. This measures EXACTLY that: the standalone
``ops.retinanet_loss_levels`` forward at production shapes (800x1344 anchor
set, 90 classes, 100 padded GT) with ``use_match_kernel`` off vs on, on the
real chip. The focal/smooth-L1 tail is identical in both arms, so the delta
is the matcher/targets pipeline alone.

    python tools/experiments/match_kernel_ab.py [--batch 16]

Appends one JSON line per run to tools/experiments/MATCH_KERNEL_AB.jsonl.
"""

from __future__ import annotations

import argparse
import functools
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


def time_scalar_fn(fn, *args, iters=20):
    """Scalar-forced timing (axon block_until_ready returns early on big
    outputs — CLAUDE.md); fn must return a dict of scalars."""
    out = fn(*args)
    float(jax.device_get(out["classification_loss"]))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(out["classification_loss"]))
    return (time.perf_counter() - t0) / iters * 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from pytorch_retinanet_tpu.ops import (
        generate_anchors_per_level,
        retinanet_loss_levels,
    )

    h, w, num_classes, max_gt = 800, 1344, 90, 100
    b = args.batch
    anchors_levels = [
        jnp.asarray(a) for a in generate_anchors_per_level((h, w))
    ]
    rng = np.random.default_rng(0)
    cls_levels = [
        jnp.asarray(
            rng.standard_normal((b, a.shape[0], num_classes)).astype(np.float32)
        )
        for a in anchors_levels
    ]
    box_levels = [
        jnp.asarray(rng.standard_normal((b, a.shape[0], 4)).astype(np.float32))
        for a in anchors_levels
    ]
    ctr = rng.uniform(100, 700, (b, max_gt, 2)).astype(np.float32)
    wh = rng.uniform(8, 400, (b, max_gt, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([ctr - wh / 2, ctr + wh / 2], -1))
    labels = jnp.asarray(rng.integers(1, num_classes + 1, (b, max_gt)), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=(b, max_gt)) > 0.5)

    results = {"batch": b, "backend": jax.default_backend(), "rows": []}
    vals = {}
    for kernel in (False, True):
        fn = jax.jit(
            functools.partial(
                retinanet_loss_levels,
                num_classes=num_classes,
                use_match_kernel=kernel,
            )
        )
        ms = time_scalar_fn(
            fn, cls_levels, box_levels, anchors_levels, boxes, labels, valid,
            iters=args.iters,
        )
        out = fn(cls_levels, box_levels, anchors_levels, boxes, labels, valid)
        vals[kernel] = {
            k: float(jax.device_get(v)) for k, v in sorted(out.items())
        }
        row = {"use_match_kernel": kernel, "loss_fwd_ms": round(ms, 3)}
        print(row)
        results["rows"].append(row)

    # exactness is part of the experiment: the kernel must not change the loss
    results["losses_exactly_equal"] = vals[False] == vals[True]
    results["losses"] = vals[True]
    out_path = os.path.join(
        os.path.dirname(__file__), "MATCH_KERNEL_AB.jsonl"
    )
    with open(out_path, "a") as f:
        f.write(json.dumps(results) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
