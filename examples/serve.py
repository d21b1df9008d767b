"""Minimal serving loop over an exported inference artifact.

Pairs with ``tools/export_model.py``: the artifact is the COMPILED inference
program (weights baked in); this script is everything a server needs — host
preprocessing into the artifact's static bucket, batched invocation, and
box rescale back to original coordinates. No model construction, no flax,
no weights on disk.

    python tools/export_model.py --backbone resnet18 --num-classes 4 \
        --min-size 64 --max-size 96 --batch 2 --out-dir exported/
    python examples/serve.py exported/resnet18_64x96_b2.stablehlo img1.jpg img2.jpg
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
    if infer.meta is not None:
        # The sidecar records the TRUE resize rule (e.g. 800/1333); the padded
        # bucket dims are ceil32'd and would distort it (800/1344).
        min_size, max_size = infer.meta["min_size"], infer.meta["max_size"]
    else:  # legacy artifact without sidecar: best effort from padded dims
        min_size, max_size = min(bh, bw), max(bh, bw)

    for start in range(0, len(paths), batch):
        chunk = paths[start : start + batch]
        images = np.zeros((batch, bh, bw, 3), np.float32)
        sizes = np.ones((batch, 2), np.float32)
        origs = []
        for i, p in enumerate(chunk):
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            padded, (nh, nw), (oh, ow) = resize_to_bucket(img, min_size, max_size)
            if padded.shape[:2] != (bh, bw):
                raise SystemExit(
                    f"{p}: orientation maps to bucket {padded.shape[:2]}, "
                    f"artifact is {(bh, bw)} — export/serve the other bucket too"
                )
            images[i] = padded
            sizes[i] = (nh, nw)
            origs.append((oh, ow))

        out = infer(images, sizes)
        for i, p in enumerate(chunk):
            n = int(out["valid"][i].sum())
            boxes = np.asarray(
                rescale_boxes(out["boxes"][i, :n], sizes[i], np.asarray(origs[i]))
            )
            print(f"{p}: {n} detections")
            for b, s, l in zip(boxes, out["scores"][i, :n], out["labels"][i, :n]):
                print(f"  label={int(l)} score={float(s):.3f} box={b.round(1).tolist()}")


if __name__ == "__main__":
    main()
