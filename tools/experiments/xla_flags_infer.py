"""A/B XLA:TPU compiler options on the headline inference program.

Companion to xla_flags_train.py: measures bench.py's EXACT batch-32
R50-FPN 800px forward+postprocess program under a named compiler-option
set (via ``jax.jit(compiler_options=...)`` — the only channel guaranteed
to reach this harness's remote compiler). Appends to
tools/experiments/XLA_FLAGS_INFER.jsonl.

    python tools/experiments/xla_flags_infer.py --set vmem64m
"""

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

SETS = {
    "baseline": None,
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", dest="opt_set", default="baseline",
                    choices=sorted(SETS))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    opts = SETS[args.opt_set]
    print(f"device: {jax.devices()[0]}  set={args.opt_set} opts={opts}",
          flush=True)

    from pytorch_retinanet_tpu.models import RetinaNetModule
    from pytorch_retinanet_tpu.models.retinanet import apply_detector
    from pytorch_retinanet_tpu.ops import (
        generate_anchors_per_level,
        process_detections_multilevel_batch,
    )

    size = (800, 1344)
    module = RetinaNetModule(backbone_kind="resnet50", num_classes=90)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)))
    anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level(size)]

    # Scalar-forced timing per the CLAUDE.md axon rule.
    @__import__("functools").partial(jax.jit, compiler_options=opts)
    def infer_scalar(variables, images, image_sizes):
        cls_l, box_l = apply_detector(module, variables, images,
                                      return_levels=True)
        det = process_detections_multilevel_batch(
            cls_l, box_l, anchors_levels, image_sizes
        )
        return sum(jnp.sum(l.astype(jnp.float32)) for l in det)

    x = jnp.asarray(
        np.random.default_rng(0).random((args.batch, *size, 3), np.float32)
    )
    sizes = jnp.tile(jnp.asarray([[800.0, 1333.0]], jnp.float32),
                     (args.batch, 1))
    float(jax.device_get(infer_scalar(variables, x, sizes)))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = infer_scalar(variables, x, sizes)
    float(jax.device_get(out))
    dt = (time.perf_counter() - t0) / args.iters
    rec = {
        "set": args.opt_set,
        "compiler_options": opts,
        "batch": args.batch,
        "img_per_sec": round(args.batch / dt, 2),
        "ms_per_batch": round(dt * 1e3, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))
    out_path = os.path.join(os.path.dirname(__file__), "XLA_FLAGS_INFER.jsonl")
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
