"""Serving latency: end-to-end single-request inference at small batches.

bench.py measures saturated THROUGHPUT (batch 32, steady-state, on-device
timing). A serving deployment cares about request LATENCY: host image →
device transfer → forward+postprocess → detections back on host. This
times that full path per batch size and writes LATENCY.json.

    python tools/bench_latency.py [--batches 1,2,4,8] [--iters 30]

Per batch size it reports:
  p50_ms / p90_ms   wall-clock per request, detections fetched as the
                    4-array pytree (the r3 serving path, kept for delta)
  p50_packed_ms     same request but fetching ONE packed [B, D, 6] buffer
                    (ops.pack_detections — one transfer round trip, not 4)
  p50_pipelined_ms  packed requests at pipeline depth 2: request i+1 is
                    dispatched before request i's detections are fetched
                    (examples/serve.py's loop), amortizing dispatch/fetch
                    round trips under device compute
  compute_ms        device-only forward+post (scalar-forced, the CLAUDE.md
                    axon timing rule)
  dispatch_ms       time for the async jit call to RETURN (enqueue cost —
                    no compute, no fetch)
  fetch4_ms / fetch1_ms
                    device→host fetch of an ALREADY-COMPLETE result: the
                    4-array pytree vs the single packed buffer. These two
                    attribute the p50-vs-compute gap (r3 ADVICE: the gap is
                    dispatch + detection fetch, NOT image transfer — images
                    are staged on device before the timed loop).
  img_per_sec       throughput at that batch from the PIPELINED path

It also measures the image-transfer cost once per batch size, f32 vs uint8
wire format (scalar-forced; on this dev harness host→device goes through a
remote tunnel, so the absolute number measures the harness — the 4x byte
ratio is the framework-relevant part).

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


def _p(lat, q):
    lat = sorted(lat)
    return lat[min(int(len(lat) * q), len(lat) - 1)]


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
        pack_detections,
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

    @jax.jit
    def infer_packed(variables, images, image_sizes):
        return pack_detections(infer(variables, images, image_sizes))

    # Device-only timing obeys the axon rule: reduce to a scalar + device_get.
    @jax.jit
    def infer_scalar(variables, images, image_sizes):
        det = infer(variables, images, image_sizes)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in det)

    rng = np.random.default_rng(0)
    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        host_imgs = rng.random((b, *size, 3), dtype=np.float32)
        host_sizes = np.tile(np.asarray([[800.0, 1333.0]], np.float32), (b, 1))
        # Device-staged inputs: the compute latency a co-located server
        # sees. (On this dev harness, host->device goes through a remote
        # tunnel at ~10s of MB/request — that transfer measures the
        # harness, not the framework, so it is reported separately.)
        dev_imgs = jnp.asarray(host_imgs)
        dev_sizes = jnp.asarray(host_sizes)

        def request() -> float:
            t0 = time.perf_counter()
            det = infer(variables, dev_imgs, dev_sizes)
            jax.device_get(det)  # 4-array pytree fetch (r3 path)
            return (time.perf_counter() - t0) * 1e3

        def request_packed() -> float:
            t0 = time.perf_counter()
            packed = infer_packed(variables, dev_imgs, dev_sizes)
            jax.device_get(packed)  # ONE buffer fetch
            return (time.perf_counter() - t0) * 1e3

        request()  # compile + warm
        request_packed()
        lat = [request() for _ in range(args.iters)]
        lat_packed = [request_packed() for _ in range(args.iters)]

        # Pipelined (depth 2): dispatch i+1 before fetching i — the
        # examples/serve.py loop. Per-request time = wall / iters.
        pending = infer_packed(variables, dev_imgs, dev_sizes)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            nxt = infer_packed(variables, dev_imgs, dev_sizes)
            jax.device_get(pending)
            pending = nxt
        jax.device_get(pending)
        pipelined_ms = (time.perf_counter() - t0) / (args.iters + 1) * 1e3

        # Device-only compute (scalar-forced).
        float(jax.device_get(infer_scalar(variables, dev_imgs, dev_sizes)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = infer_scalar(variables, dev_imgs, dev_sizes)
        float(jax.device_get(out))
        compute_ms = (time.perf_counter() - t0) / args.iters * 1e3

        # --- gap attribution (r3 ADVICE): dispatch + fetch, separately ---
        t0 = time.perf_counter()
        det = infer(variables, dev_imgs, dev_sizes)  # async: enqueue only
        dispatch_ms = (time.perf_counter() - t0) * 1e3
        jax.block_until_ready(det)
        time.sleep(0.05)  # result certainly complete: fetch-only timing next
        t0 = time.perf_counter()
        jax.device_get(det)
        fetch4_ms = (time.perf_counter() - t0) * 1e3
        packed = infer_packed(variables, dev_imgs, dev_sizes)
        jax.block_until_ready(packed)
        time.sleep(0.05)
        t0 = time.perf_counter()
        jax.device_get(packed)
        fetch1_ms = (time.perf_counter() - t0) * 1e3

        # Image transfer, f32 vs uint8 wire (scalar-forced: block_until_ready
        # on a large array returns early on this harness, CLAUDE.md).
        reduce = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
        host_u8 = (host_imgs * 255).astype(np.uint8)
        float(jax.device_get(reduce(dev_imgs)))  # compile + warm f32
        t0 = time.perf_counter()
        float(jax.device_get(reduce(jnp.asarray(host_imgs))))
        transfer_f32_ms = (time.perf_counter() - t0) * 1e3
        float(jax.device_get(reduce(jnp.asarray(host_u8))))  # compile u8
        t0 = time.perf_counter()
        float(jax.device_get(reduce(jnp.asarray(host_u8))))
        transfer_u8_ms = (time.perf_counter() - t0) * 1e3

        row = {
            "batch": b,
            "p50_ms": round(_p(lat, 0.5), 2),
            "p90_ms": round(_p(lat, 0.9), 2),
            "p50_packed_ms": round(_p(lat_packed, 0.5), 2),
            "p50_pipelined_ms": round(pipelined_ms, 2),
            "compute_ms": round(compute_ms, 2),
            "dispatch_ms": round(dispatch_ms, 2),
            "fetch4_ms": round(fetch4_ms, 2),
            "fetch1_ms": round(fetch1_ms, 2),
            "host_transfer_f32_ms": round(transfer_f32_ms, 2),
            "host_transfer_u8_ms": round(transfer_u8_ms, 2),
            "img_per_sec": round(b / (pipelined_ms / 1e3), 1),
        }
        rows.append(row)
        print(json.dumps(row))

    out_path = os.path.join(os.path.dirname(__file__), "..", "LATENCY.json")
    payload = {
        "metric": f"serving_latency_resnet50_{size[0]}x{size[1]}",
        "backend": jax.default_backend(),
        "unit": "ms/request",
        "note": (
            "p50/p90: dispatch+compute+fetch per request, images staged on "
            "device (no per-request image transfer in the timed loop). "
            "host_transfer_*: separate scalar-forced staging cost through "
            "this harness's remote tunnel (measures the tunnel; the f32/u8 "
            "ratio is the framework-relevant part). img_per_sec is the "
            "PIPELINED packed path."
        ),
        "rows": rows,
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
