"""Training-step throughput benchmark (not the headline bench; see bench.py).

Measures the fully-jitted, donated train step (forward + loss + grad +
optimizer) for RetinaNet R50-FPN at the 800px bucket.

    python tools/bench_train.py [--batch 8] [--backbone resnet50]
"""

from __future__ import annotations

import argparse
import json
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_retinanet_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--backbone", default="resnet50")
    # 800x1344 IS the real default landscape bucket
    # (resolution_buckets(800, 1333) → ceil32) — bench.py measures the same.
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--baseline", type=float, default=None,
        help="external baseline img/s for the vs_baseline field",
    )
    args = ap.parse_args()

    from pytorch_retinanet_tpu.engine.optim import build_optimizer
    from pytorch_retinanet_tpu.models import RetinaNetModule
    from pytorch_retinanet_tpu.ops import generate_anchors, retinanet_loss

    size = (args.height, args.width)
    module = RetinaNetModule(backbone_kind=args.backbone, num_classes=90)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)))
    params, stats = variables["params"], variables["batch_stats"]
    optimizer = build_optimizer(
        "torch.optim.SGD", {"lr": 1e-4, "momentum": 0.9, "weight_decay": 1e-4}
    )
    opt_state = optimizer.init(params)
    anchors = jnp.asarray(generate_anchors(size))

    @jax.jit
    def train_step(params, opt_state, images, boxes, labels, valid):
        def loss_fn(p):
            c, b = module.apply({"params": p, "batch_stats": stats}, images, False)
            l = retinanet_loss(c, b, anchors, boxes, labels, valid, num_classes=90)
            return l["classification_loss"] + l["regression_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    train_step = jax.jit(train_step, donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((args.batch, *size, 3), np.float32))
    boxes = jnp.asarray(
        np.tile(np.array([[[100.0, 100, 400, 400]]], np.float32), (args.batch, 1, 1))
    )
    labels = jnp.ones((args.batch, 1), jnp.int32)
    valid = jnp.ones((args.batch, 1), bool)

    params, opt_state, loss = train_step(params, opt_state, images, boxes, labels, valid)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, loss = train_step(
            params, opt_state, images, boxes, labels, valid
        )
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / args.iters

    img_per_sec = args.batch / dt
    # Same one-line JSON schema as bench.py so the driver can archive it.
    line = json.dumps(
        {
            "metric": f"train_step_{args.backbone}_{args.height}x{args.width}_bs{args.batch}",
            "value": round(img_per_sec, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(img_per_sec / args.baseline, 2)
            if args.baseline
            else None,
            "step_ms": round(dt * 1000, 1),
            "backend": jax.default_backend(),
        }
    )
    print(line)
    # Persist at the default config so the artifact stays in sync with runs.
    if (args.backbone, args.height, args.width, args.batch) == (
        "resnet50", 800, 1344, 8,
    ):
        out = os.path.join(os.path.dirname(__file__), "..", "TRAIN_BENCH.json")
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
