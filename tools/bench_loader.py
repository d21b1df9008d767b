"""Host input-pipeline cost: per-image ms for decode -> resize -> collate.

The device side is measured (bench.py: ~215 img/s/chip inference at 800px,
tools/bench_train.py: ~60 img/s/chip training); this closes the remaining
unmeasured production axis — what the HOST must sustain to keep a chip fed.
The reference never measures this either (its DataLoader workers are
configured blind, hparams.yaml:43-46).

Stages timed on synthetic COCO-sized JPEGs (640x480, the val2017 modal
size; JPEG quality 90):

  decode      cv2.imread + BGR->RGB           (data/pascal.py:load_image)
  sample      decode + aug + resize-to-bucket + GT pad  (loader._load_sample)
  pipeline    full DetectionLoader iteration incl. collate + prefetch queue
              (measured for BOTH image dtypes: float32 and the uint8 wire
              format, which skips the f32 convert + 4x the memcpy bytes)

Writes LOADER.json and prints one JSON line. The `implied_cores`
numbers are per-image host cost x measured device rate: how many host cores
a production deployment needs per chip (TPU-VM hosts ship 100+ vCPUs; this
container has 1, so the bench reports COST, not achievable throughput —
decode/resize are cv2 C++ loops that release the GIL, so thread workers
scale them across real cores).

Usage: python tools/bench_loader.py [--images N] [--min-size 800]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Device rates this host must feed (measured: BENCH_r02/TRAIN_BENCH on v5e).
DEVICE_INFER_IMG_S = 215.7
DEVICE_TRAIN_IMG_S = 60.6


def make_dataset(root: str, n: int) -> str:
    """Synthetic VOC-CSV dataset of COCO-modal-size JPEGs (mixed orientation,
    textured so JPEG decode cost is realistic, ~3 GT boxes/image)."""
    import cv2

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    rows = ["filename,width,height,class,xmin,ymin,xmax,ymax,labels"]
    for i in range(n):
        w, h = (640, 480) if i % 2 == 0 else (480, 640)
        # Textured noise compresses like a natural image (flat fills would
        # make decode unrealistically cheap).
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        img = cv2.GaussianBlur(img, (0, 0), 3)
        path = os.path.join(root, f"im{i}.jpg")
        cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        for b in range(3):
            x0, y0 = rng.randint(0, w - 60), rng.randint(0, h - 60)
            bw, bh = rng.randint(30, 60, 2)
            rows.append(
                f"{path},{w},{h},c{b % 3},{x0},{y0},{x0 + bw},{y0 + bh},{b % 3 + 1}"
            )
    csv_path = os.path.join(root, "bench.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return csv_path


def time_per_image(fn, n_images: int, repeats: int = 3) -> float:
    """Best-of-repeats wall ms per image (best-of filters scheduler noise on
    the shared container)."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, (time.perf_counter() - t0) / n_images * 1e3)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--min-size", type=int, default=800)
    ap.add_argument("--max-size", type=int, default=1333)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--out", default="LOADER.json")
    args = ap.parse_args()

    from pytorch_retinanet_tpu.data import DetectionLoader, PascalDataset
    from pytorch_retinanet_tpu.data.transforms import Compose, HorizontalFlip, ToFloat

    csv_path = make_dataset("/tmp/loader_bench", args.images)
    ds = PascalDataset(
        csv_path, transforms=Compose([HorizontalFlip(p=0.5), ToFloat()])
    )
    n = len(ds)

    # Stage 1: decode only.
    decode_ms = time_per_image(
        lambda: [ds.load_image(i) for i in range(n)], n
    )

    # Stage 2: full sample prep (decode + aug + resize + target), via the
    # loader's own per-sample path so the measured code is the shipped code.
    loader = DetectionLoader(
        ds, args.batch_size, min_size=args.min_size, max_size=args.max_size,
        num_workers=1, shuffle=False,
    )
    sample_ms = time_per_image(
        lambda: [loader._load_sample(i) for i in range(n)], n
    )

    # Stage 3: full pipeline (adds collate into pinned fixed-shape arrays +
    # the prefetch queue machinery) — f32 and the uint8 wire format.
    def drain(ld):
        count = 0
        for batch in ld:
            count += int(batch["batch_mask"].sum())
        assert count == n, (count, n)

    pipeline_ms = time_per_image(lambda: drain(loader), n)
    loader_u8 = DetectionLoader(
        PascalDataset(csv_path),  # no ToFloat: bytes stay bytes end-to-end
        args.batch_size, min_size=args.min_size, max_size=args.max_size,
        num_workers=1, shuffle=False, image_dtype=np.uint8,
    )
    pipeline_u8_ms = time_per_image(lambda: drain(loader_u8), n)

    result = {
        "images": n,
        "source_size": "640x480 jpeg q90 (COCO val2017 modal)",
        "bucket": f"{args.min_size}/{args.max_size}",
        "per_image_ms": {
            "decode": round(decode_ms, 3),
            "sample_prep": round(sample_ms, 3),
            "full_pipeline": round(pipeline_ms, 3),
            "full_pipeline_uint8": round(pipeline_u8_ms, 3),
        },
        "single_core_img_per_sec": {
            "float32": round(1e3 / pipeline_ms, 1),
            "uint8": round(1e3 / pipeline_u8_ms, 1),
        },
        # Host cores per chip = per-image cost x device rate. cv2 decode and
        # resize release the GIL, so DetectionLoader's thread pool spreads
        # this across cores ~linearly until memory bandwidth intervenes.
        "implied_host_cores_per_chip": {
            "inference_at_%.0f_img_s" % DEVICE_INFER_IMG_S: round(
                pipeline_u8_ms * DEVICE_INFER_IMG_S / 1e3, 2
            ),
            "training_at_%.0f_img_s" % DEVICE_TRAIN_IMG_S: round(
                pipeline_u8_ms * DEVICE_TRAIN_IMG_S / 1e3, 2
            ),
        },
        "note": "cost measurement on a 1-core container; production TPU-VM "
        "hosts have 100+ vCPUs and the loader's ThreadPoolExecutor scales "
        "the GIL-free cv2 stages across them",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"metric": "host_pipeline_per_image_ms",
                      "value": result["per_image_ms"]["full_pipeline_uint8"],
                      "unit": "ms/image",
                      "detail": result["implied_host_cores_per_chip"]}))


if __name__ == "__main__":
    main()
