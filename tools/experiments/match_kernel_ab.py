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
Rows are labeled ``loss_fwd_ms`` (forward only) and ``loss_grad_ms``
(value_and_grad wrt the head outputs — what the train step actually pays;
the match targets are stop_gradient'd so both arms differentiate the same
focal/smooth-L1 tail).

On a non-TPU backend the kernel cannot lower; pass ``--interpret`` to run
the Pallas arm in interpret mode (functional check only — timings are
meaningless off-chip), otherwise the script exits early.
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


def time_grad_fn(fn, *args, iters=20):
    """Time value_and_grad; reduces grads to a scalar inside the jit."""
    out = fn(*args)
    float(jax.device_get(out))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters * 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--max-gt", type=int, default=100)
    ap.add_argument(
        "--interpret", action="store_true",
        help="run the Pallas arm in interpret mode (non-TPU backends; "
        "functional check only, timings meaningless)",
    )
    args = ap.parse_args()

    if jax.default_backend() != "tpu" and not args.interpret:
        print(
            f"backend is {jax.default_backend()!r}, not 'tpu': the Pallas "
            "kernel cannot lower. Re-run with --interpret for a functional "
            "check, or on a TPU for timings.",
            file=sys.stderr,
        )
        sys.exit(2)

    from pytorch_retinanet_tpu.ops import (
        generate_anchors_per_level,
        retinanet_loss_levels,
    )

    h, w, num_classes, max_gt = args.height, args.width, 90, args.max_gt
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

    results = {
        "batch": b,
        "hw": [h, w],
        "max_gt": max_gt,
        "backend": jax.default_backend(),
        "interpret": args.interpret,
        "note": "loss_fwd_ms is forward-only; loss_grad_ms is "
                "value_and_grad wrt head outputs (the train-step cost)",
        "rows": [],
    }
    vals = {}
    for kernel in (False, True):
        loss_fn = functools.partial(
            retinanet_loss_levels,
            num_classes=num_classes,
            use_match_kernel=kernel,
            match_interpret=args.interpret,
        )
        fn = jax.jit(loss_fn)
        ms = time_scalar_fn(
            fn, cls_levels, box_levels, anchors_levels, boxes, labels, valid,
            iters=args.iters,
        )
        out = fn(cls_levels, box_levels, anchors_levels, boxes, labels, valid)
        vals[kernel] = {
            k: float(jax.device_get(v)) for k, v in sorted(out.items())
        }

        # Grad arm: what the train step pays — total loss + grads wrt the
        # head outputs, reduced to one scalar on-device (axon timing rule).
        def total_with_grads(cls_l, box_l):
            d = loss_fn(cls_l, box_l, anchors_levels, boxes, labels, valid)
            return d["classification_loss"] + d["regression_loss"]

        @jax.jit
        def grad_scalar(cls_l, box_l):
            val, grads = jax.value_and_grad(total_with_grads, argnums=(0, 1))(
                cls_l, box_l
            )
            gsum = sum(jnp.sum(jnp.abs(g)) for gs in grads for g in gs)
            # 1e-30 (not 0.0) so the grads cannot be simplified out of the
            # program; the perturbation is below f32 resolution of val.
            return val + jnp.float32(1e-30) * gsum

        gms = time_grad_fn(grad_scalar, cls_levels, box_levels, iters=args.iters)
        row = {
            "use_match_kernel": kernel,
            "loss_fwd_ms": round(ms, 3),
            "loss_grad_ms": round(gms, 3),
        }
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
