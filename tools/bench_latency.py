"""Serving latency: end-to-end single-request inference at small batches.

bench.py measures saturated THROUGHPUT (batch 32, steady-state, on-device
timing). A serving deployment cares about request LATENCY: host image →
device transfer → forward+postprocess → detections back on host. This
times that full path per batch size and writes LATENCY.json.

    python tools/bench_latency.py [--batches 1,2,4,8] [--iters 30]

Per batch size it reports:
  p50_ms / p90_ms  wall-clock per request (transfer + compute + fetch)
  compute_ms       device-only forward+post (scalar-forced, the
                   CLAUDE.md axon timing rule)
  img_per_sec      throughput at that batch (latency-bound, NOT bench.py's
                   saturated number)

The reference has no serving story at all (deployment = torch.save +
python reload, SURVEY §2.2); this quantifies ours (examples/serve.py /
export.py run the same compiled program).
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    args = ap.parse_args()

    from pytorch_retinanet_tpu.models import RetinaNetModule
    from pytorch_retinanet_tpu.models.retinanet import apply_detector
    from pytorch_retinanet_tpu.ops import (
        generate_anchors_per_level,
        process_detections_multilevel_batch,
    )

    size = (args.height, args.width)
    module = RetinaNetModule(backbone_kind="resnet50", num_classes=90)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)))
    anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level(size)]

    @jax.jit
    def infer(variables, images, image_sizes):
        cls_l, box_l = apply_detector(module, variables, images, return_levels=True)
        return process_detections_multilevel_batch(
            cls_l, box_l, anchors_levels, image_sizes
        )

    # Device-only timing obeys the axon rule: reduce to a scalar + device_get.
    @jax.jit
    def infer_scalar(variables, images, image_sizes):
        det = infer(variables, images, image_sizes)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in det)

    rng = np.random.default_rng(0)
    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        host_imgs = rng.random((b, *size, 3), dtype=np.float32)
        host_sizes = np.tile(
            np.asarray([[800.0, 1333.0]], np.float32), (b, 1)
        )
        # Device-staged inputs: the compute latency a co-located server
        # sees. (On this dev harness, host->device goes through a remote
        # tunnel at ~10s of MB/request — that transfer measures the
        # harness, not the framework, so it is reported separately.)
        dev_imgs = jnp.asarray(host_imgs)
        dev_sizes = jnp.asarray(host_sizes)

        def request() -> float:
            t0 = time.perf_counter()
            det = infer(variables, dev_imgs, dev_sizes)
            # Serving fetches the (small) detections to the host.
            jax.device_get(det)
            return (time.perf_counter() - t0) * 1e3

        request()  # compile + warm
        lat = sorted(request() for _ in range(args.iters))

        float(jax.device_get(infer_scalar(variables, dev_imgs, dev_sizes)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = infer_scalar(variables, dev_imgs, dev_sizes)
        float(jax.device_get(out))
        compute_ms = (time.perf_counter() - t0) / args.iters * 1e3

        # Force the transferred buffer through a scalar reduction: on this
        # harness block_until_ready on a large array returns early
        # (CLAUDE.md axon timing rule), under-measuring the transfer.
        reduce = jax.jit(lambda a: jnp.sum(a))
        float(jax.device_get(reduce(dev_imgs)))  # compile + warm the reduce
        t0 = time.perf_counter()
        float(jax.device_get(reduce(jnp.asarray(host_imgs))))
        transfer_ms = (time.perf_counter() - t0) * 1e3

        p50 = lat[len(lat) // 2]
        p90 = lat[int(len(lat) * 0.9)]
        rows.append(
            {
                "batch": b,
                "p50_ms": round(p50, 2),
                "p90_ms": round(p90, 2),
                "compute_ms": round(compute_ms, 2),
                "host_transfer_ms": round(transfer_ms, 2),
                "img_per_sec": round(b / (compute_ms / 1e3), 1),
            }
        )
        print(
            f"bs{b}: p50 {p50:7.2f} ms  p90 {p90:7.2f} ms  "
            f"compute {compute_ms:7.2f} ms  xfer {transfer_ms:7.2f} ms  "
            f"{rows[-1]['img_per_sec']:6.1f} img/s"
        )

    out_path = os.path.join(os.path.dirname(__file__), "..", "LATENCY.json")
    payload = {
        "metric": f"serving_latency_resnet50_{size[0]}x{size[1]}",
        "backend": jax.default_backend(),
        "unit": "ms/request",
        "rows": rows,
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
