"""Training-step throughput benchmark (not the headline bench; see bench.py).

Measures the fully-jitted, donated train step for RetinaNet R50-FPN at the
800px bucket, mirroring the Trainer's REAL step (engine/trainer.py
_build_steps): per-level head outputs + per-level loss (no cross-level
concat), plain XLA stem (the trainer reverted the fused-stem train path
after a remote-compile pathology — trainer.py forward_levels), SGD+momentum
update. ``--fused-stem`` opts into the kernel path for comparison runs.

    python tools/bench_train.py [--batch 8] [--remat] [--fused-stem]
    python tools/bench_train.py --sweep      # batch 8/16/32 x remat on/off

The sweep records every point and the knee into TRAIN_BENCH.json (the train
analog of bench.py's batch-knee note, VERDICT r2 #3b).
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


def build_step(module, stats, optimizer, size, use_fused_stem,
               compiler_options=None):
    """One fully-jitted donated train step (mirrors trainer._build_steps)."""
    from pytorch_retinanet_tpu.kernels import fused_stem
    from pytorch_retinanet_tpu.ops import (
        generate_anchors_per_level,
        retinanet_loss_levels,
    )

    anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level(size)]

    def train_step(params, opt_state, images, boxes, labels, valid):
        def loss_fn(p):
            variables = {"params": p, "batch_stats": stats}
            if use_fused_stem:
                stem = fused_stem(variables, images)
                c, b = module.apply(
                    variables, images, False, return_levels=True, stem_in=stem
                )
            else:
                c, b = module.apply(variables, images, False, return_levels=True)
            l = retinanet_loss_levels(
                c, b, anchors_levels, boxes, labels, valid, num_classes=90
            )
            return l["classification_loss"] + l["regression_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(
        train_step, donate_argnums=(0, 1), compiler_options=compiler_options
    )


def measure(backbone, size, batch, remat, use_fused_stem, iters, flat_opt=False,
            compiler_options=None):
    from pytorch_retinanet_tpu.engine.optim import build_optimizer
    from pytorch_retinanet_tpu.models import RetinaNetModule

    module = RetinaNetModule(backbone_kind=backbone, num_classes=90, remat=remat)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)))
    params, stats = variables["params"], variables["batch_stats"]
    optimizer = build_optimizer(
        "torch.optim.SGD",
        {"lr": 1e-4, "momentum": 0.9, "weight_decay": 1e-4},
        flatten=flat_opt,
    )
    opt_state = optimizer.init(params)
    step = build_step(
        module, stats, optimizer, size, use_fused_stem,
        compiler_options=compiler_options,
    )

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, *size, 3), np.float32))
    boxes = jnp.asarray(
        np.tile(np.array([[[100.0, 100, 400, 400]]], np.float32), (batch, 1, 1))
    )
    labels = jnp.ones((batch, 1), jnp.int32)
    valid = jnp.ones((batch, 1), bool)

    params, opt_state, loss = step(params, opt_state, images, boxes, labels, valid)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, images, boxes, labels, valid)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    del params, opt_state
    return batch / dt, dt * 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--backbone", default="resnet50")
    # 800x1344 IS the real default landscape bucket
    # (resolution_buckets(800, 1333) → ceil32) — bench.py measures the same.
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--fused-stem", action="store_true",
                    help="opt-in: stem Pallas kernel under grad (NOT the "
                         "trainer default; see trainer.py forward_levels)")
    ap.add_argument("--flat-opt", action="store_true",
                    help="optax.flatten'd optimizer (one raveled update "
                         "vector instead of ~160 per-leaf kernel chains)")
    ap.add_argument("--sweep", action="store_true",
                    help="batch 8/16/32 x remat on/off; records the knee")
    args = ap.parse_args()

    size = (args.height, args.width)
    on_tpu = jax.default_backend() == "tpu"
    use_fused = on_tpu and args.fused_stem
    out_path = os.path.join(os.path.dirname(__file__), "..", "TRAIN_BENCH.json")

    if args.sweep:
        points = []
        for remat in (False, True):
            for batch in (8, 16, 32):
                try:
                    img_s, ms = measure(
                        args.backbone, size, batch, remat, use_fused,
                        args.iters, args.flat_opt,
                    )
                except Exception as e:  # OOM at big batches is a data point
                    print(f"bs{batch} remat={remat}: FAILED ({type(e).__name__})")
                    points.append({"batch": batch, "remat": remat, "error": str(e)[:200]})
                    continue
                print(f"bs{batch} remat={remat}: {img_s:.2f} img/s ({ms:.1f} ms)")
                points.append({
                    "batch": batch, "remat": remat,
                    "img_per_sec": round(img_s, 2), "step_ms": round(ms, 1),
                })
        ok = [p for p in points if "img_per_sec" in p]
        if not ok:
            # Every point failed — still persist the error records; they are
            # the data.
            line = json.dumps({
                "metric": f"train_step_{args.backbone}_sweep_all_failed",
                "value": None, "unit": "images/sec/chip",
                "vs_baseline": None, "backend": jax.default_backend(),
                "sweep": points,
            })
            print(line)
            with open(out_path, "w") as f:
                f.write(line + "\n")
            return
        best = max(ok, key=lambda p: p["img_per_sec"])
        line = json.dumps({
            "metric": f"train_step_{args.backbone}_{args.height}x{args.width}"
                      f"_bs{best['batch']}" + ("_remat" if best["remat"] else ""),
            "value": best["img_per_sec"],
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "step_ms": best["step_ms"],
            "backend": jax.default_backend(),
            "fused_stem": use_fused,
            "sweep": points,
        })
        print(line)
        with open(out_path, "w") as f:
            f.write(line + "\n")
        return

    img_s, ms = measure(
        args.backbone, size, args.batch, args.remat, use_fused, args.iters,
        args.flat_opt,
    )
    line = json.dumps({
        "metric": f"train_step_{args.backbone}_{args.height}x{args.width}_bs{args.batch}"
                  + ("_remat" if args.remat else ""),
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "step_ms": round(ms, 1),
        "backend": jax.default_backend(),
        "fused_stem": use_fused,
        "flat_opt": args.flat_opt,
    })
    print(line)
    # Patch this point into TRAIN_BENCH.json: a single-point rerun replaces
    # the matching sweep row (the r3 artifact shipped an HTTP 500 string as
    # the bs32/remat=False datapoint — reruns must heal it in place), and a
    # --fused-stem run records the comparison point the trainer's
    # forward_levels docstring defers to (trainer.py: stem kernel under grad).
    if (
        os.path.exists(out_path)
        and (args.backbone, args.height, args.width) == ("resnet50", 800, 1344)
        and not args.flat_opt
    ):
        with open(out_path) as f:
            data = json.loads(f.read())
        point = {
            "batch": args.batch, "remat": args.remat,
            "img_per_sec": round(img_s, 2), "step_ms": round(ms, 1),
        }
        if use_fused:
            data["fused_stem_point"] = point
        else:
            sweep = data.get("sweep") or []
            replaced = False
            for i, p in enumerate(sweep):
                if p.get("batch") == args.batch and p.get("remat") == args.remat:
                    sweep[i] = point
                    replaced = True
            if not replaced:
                sweep.append(point)
            data["sweep"] = sweep
            ok = [p for p in sweep if "img_per_sec" in p]
            if ok:  # keep the headline at the sweep's best point
                best = max(ok, key=lambda p: p["img_per_sec"])
                data["metric"] = (
                    f"train_step_{args.backbone}_{args.height}x{args.width}"
                    f"_bs{best['batch']}" + ("_remat" if best["remat"] else "")
                )
                data["value"] = best["img_per_sec"]
                data["step_ms"] = best["step_ms"]
        with open(out_path, "w") as f:
            f.write(json.dumps(data) + "\n")


if __name__ == "__main__":
    main()
