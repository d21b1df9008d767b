"""Minimal serving loop over an exported inference artifact.

Pairs with ``tools/export_model.py``: the artifact is the COMPILED inference
program (weights baked in); this script is everything a server needs — host
preprocessing into the artifact's static bucket, batched invocation, and
box rescale back to original coordinates. No model construction, no flax,
no weights on disk.

Two serving-latency optimizations live here (measured in
tools/bench_latency.py):

* **uint8 wire format**: artifacts exported with ``--wire-dtype uint8``
  receive raw bytes and normalize on device — 4x fewer host→device bytes
  per request than float32.
* **request pipelining**: batch i+1 is DISPATCHED (async) before batch i's
  small detection buffers are fetched, so host↔device transfer overlaps
  device compute across requests instead of serializing with it.

    python tools/export_model.py --backbone resnet18 --num-classes 4 \
        --min-size 64 --max-size 96 --batch 2 --wire-dtype uint8 --out-dir exported/
    python examples/serve.py exported/resnet18_64x96_b2_u8.stablehlo img1.jpg img2.jpg
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(1)
    artifact, *paths = sys.argv[1:]

    import cv2

    from pytorch_retinanet_tpu.export import load_exported
    from pytorch_retinanet_tpu.models.retinanet import resize_to_bucket
    from pytorch_retinanet_tpu.ops import rescale_boxes

    infer = load_exported(artifact)
    (batch, bh, bw, _), _ = (a.shape for a in infer.in_avals)
    wire = np.dtype(infer.in_avals[0].dtype)  # float32 or uint8 artifact
    if infer.meta is not None:
        # The sidecar records the TRUE resize rule (e.g. 800/1333); the padded
        # bucket dims are ceil32'd and would distort it (800/1344).
        min_size, max_size = infer.meta["min_size"], infer.meta["max_size"]
    else:  # legacy artifact without sidecar: best effort from padded dims
        min_size, max_size = min(bh, bw), max(bh, bw)

    def emit(chunk, sizes, origs, out_dev):
        boxes_d, scores_d, labels_d, valid_d = out_dev
        out = {
            "boxes": np.asarray(boxes_d),
            "scores": np.asarray(scores_d),
            "labels": np.asarray(labels_d),
            "valid": np.asarray(valid_d),
        }
        for i, p in enumerate(chunk):
            n = int(out["valid"][i].sum())
            boxes = np.asarray(
                rescale_boxes(out["boxes"][i, :n], sizes[i], np.asarray(origs[i]))
            )
            print(f"{p}: {n} detections")
            for b, s, l in zip(boxes, out["scores"][i, :n], out["labels"][i, :n]):
                print(f"  label={int(l)} score={float(s):.3f} box={b.round(1).tolist()}")

    pending = None  # (chunk, sizes, origs, device outputs) — depth-2 pipeline
    for start in range(0, len(paths), batch):
        chunk = paths[start : start + batch]
        images = np.zeros((batch, bh, bw, 3), wire)
        sizes = np.ones((batch, 2), np.float32)
        origs = []
        for i, p in enumerate(chunk):
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            padded, (nh, nw), (oh, ow) = resize_to_bucket(
                img, min_size, max_size, wire_dtype=wire
            )
            if padded.shape[:2] != (bh, bw):
                raise SystemExit(
                    f"{p}: orientation maps to bucket {padded.shape[:2]}, "
                    f"artifact is {(bh, bw)} — export/serve the other bucket too"
                )
            images[i] = padded
            sizes[i] = (nh, nw)
            origs.append((oh, ow))

        # Dispatch THIS batch before fetching the previous one: the fetch of
        # batch i-1 rides under batch i's device compute.
        out_dev = infer.dispatch(images, sizes)
        if pending is not None:
            emit(*pending)
        pending = (chunk, sizes, origs, out_dev)
    if pending is not None:
        emit(*pending)


if __name__ == "__main__":
    main()
