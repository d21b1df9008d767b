"""Host input-pipeline cost: per-image ms, per-STAGE attributed (v2).

The device side is measured (bench.py: ~215 img/s/chip inference at 800px,
tools/bench_train.py: ~60 img/s/chip training); this closes the remaining
unmeasured production axis — what the HOST must sustain to keep a chip fed.
The reference never measures this either (its DataLoader workers are
configured blind, hparams.yaml:43-46).

Round-4 verdict: LOADER.json's 13.8 ms/img `sample_prep` was unattributed
(decode alone was 2.1 — what were the other 11.7?). v2 times every stage
individually on the same synthetic COCO-sized JPEGs (640x480, val2017 modal
size, JPEG q90):

  decode        cv2.imread + BGR->RGB               (data/pascal.py:load_image)
  tofloat       u8 -> f32/255 at source size        (transforms.ToFloat)
  flip_f32/u8   HorizontalFlip p=1 on each dtype    (transforms.HorizontalFlip)
  resize_f32/u8 cv2.resize to the 800 bucket scale  (models.resize_for_bucket)
  pad_f32/u8    full-bucket zeros + frame write     (the collate buffer)
  targets       box rescale + pad_targets           (loader._load_sample tail)

plus the three shipped end-to-end pipelines:

  full_pipeline          float pipeline (ToFloat-first chain, f32 wire)
  full_pipeline_uint8    transform-less byte pipeline (u8 wire)
  full_pipeline_train    the TRAINING DEFAULT since round 5: keep_bytes
                         geometric chain (HorizontalFlip on bytes) + "auto"
                         wire -> uint8 end-to-end (engine/model.py)

Writes LOADER.json and prints one JSON line. The `implied_cores` numbers
are per-image host cost x measured device rate: how many host cores a
production deployment needs per chip (TPU-VM hosts ship 100+ vCPUs; this
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

# Device rates this host must feed (measured: BENCH_r04/TRAIN_BENCH on v5e).
DEVICE_INFER_IMG_S = 215.6
DEVICE_TRAIN_IMG_S = 57.9


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

    import cv2

    from pytorch_retinanet_tpu.data import DetectionLoader, PascalDataset
    from pytorch_retinanet_tpu.data.loader import pad_targets
    from pytorch_retinanet_tpu.data.transforms import (
        Compose,
        HorizontalFlip,
        ToFloat,
        build_transforms,
    )
    from pytorch_retinanet_tpu.models.retinanet import resize_for_bucket

    csv_path = make_dataset("/tmp/loader_bench", args.images)
    ds = PascalDataset(
        csv_path, transforms=Compose([HorizontalFlip(p=0.5), ToFloat()])
    )
    n = len(ds)

    # ---------- stage attribution on pre-decoded frames ---------- #
    raw = [ds.load_image(i) for i in range(n)]  # uint8 source frames
    raw_f32 = [im.astype(np.float32) / 255.0 for im in raw]
    flip = HorizontalFlip(p=1.0)
    rngs = [np.random.default_rng(i) for i in range(n)]
    dummy_boxes = np.asarray([[10, 10, 50, 50]], np.float32)
    dummy_labels = np.asarray([1], np.int64)

    def bucket_of(im):
        h0, w0 = im.shape[:2]
        s = min(args.min_size / min(h0, w0), args.max_size / max(h0, w0))
        return int(round(w0 * s)), int(round(h0 * s))

    sizes = [bucket_of(im) for im in raw]  # (new_w, new_h)

    stages = {
        "decode": lambda: [ds.load_image(i) for i in range(n)],
        "tofloat": lambda: [im.astype(np.float32) / 255.0 for im in raw],
        "flip_u8": lambda: [
            flip(im, dummy_boxes, dummy_labels, rngs[i]) for i, im in enumerate(raw)
        ],
        "flip_f32": lambda: [
            flip(im, dummy_boxes, dummy_labels, rngs[i])
            for i, im in enumerate(raw_f32)
        ],
        "resize_u8": lambda: [
            cv2.resize(im, sizes[i], interpolation=cv2.INTER_LINEAR)
            for i, im in enumerate(raw)
        ],
        "resize_f32": lambda: [
            cv2.resize(im, sizes[i], interpolation=cv2.INTER_LINEAR)
            for i, im in enumerate(raw_f32)
        ],
        "targets": lambda: [
            pad_targets(dummy_boxes * 1.25, dummy_labels, 100) for _ in range(n)
        ],
    }
    # full-bucket frame materialization (the collate buffer write)
    resized_u8 = [
        cv2.resize(im, sizes[i], interpolation=cv2.INTER_LINEAR)
        for i, im in enumerate(raw)
    ]
    resized_f32 = [
        cv2.resize(im, sizes[i], interpolation=cv2.INTER_LINEAR)
        for i, im in enumerate(raw_f32)
    ]
    pad_hw = (1344, 1344)  # conservative: max bucket side both ways

    def pad_frames(frames, dtype):
        out = []
        for fr in frames:
            buf = np.zeros((*pad_hw, 3), dtype)
            buf[: fr.shape[0], : fr.shape[1]] = fr
            out.append(buf)
        return out

    stages["pad_u8"] = lambda: pad_frames(resized_u8, np.uint8)
    stages["pad_f32"] = lambda: pad_frames(resized_f32, np.float32)

    stage_ms = {k: round(time_per_image(v, n), 3) for k, v in stages.items()}

    # ---------- shipped pipelines ---------- #
    loader = DetectionLoader(
        ds, args.batch_size, min_size=args.min_size, max_size=args.max_size,
        num_workers=1, shuffle=False,
    )
    sample_ms = time_per_image(
        lambda: [loader._load_sample(i) for i in range(n)], n
    )

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

    # The round-5 TRAINING DEFAULT: keep_bytes geometric chain + auto wire.
    train_tfms = build_transforms(
        [{"class_name": "HorizontalFlip", "params": {"p": 0.5}}],
        keep_bytes=True,
    )
    loader_train = DetectionLoader(
        PascalDataset(csv_path, transforms=train_tfms),
        args.batch_size, min_size=args.min_size, max_size=args.max_size,
        num_workers=1, shuffle=False, image_dtype="auto",
    )
    pipeline_train_ms = time_per_image(lambda: drain(loader_train), n)
    assert loader_train.image_dtype == np.uint8, (
        "auto wire should resolve to uint8 for the byte-preserving chain"
    )

    result = {
        "images": n,
        "source_size": "640x480 jpeg q90 (COCO val2017 modal)",
        "bucket": f"{args.min_size}/{args.max_size}",
        "per_image_ms": {
            "decode": stage_ms["decode"],
            "sample_prep": round(sample_ms, 3),
            "full_pipeline": round(pipeline_ms, 3),
            "full_pipeline_uint8": round(pipeline_u8_ms, 3),
            "full_pipeline_train_default": round(pipeline_train_ms, 3),
        },
        "stage_attribution_ms": stage_ms,
        "attribution_note": (
            "sample_prep (float pipeline) = decode + tofloat + flip_f32/2 "
            "(p=0.5) + resize_f32 + targets; the remainder is buffer "
            "alloc/copy. The byte pipeline replaces tofloat+flip_f32+"
            "resize_f32 with flip_u8+resize_u8 (4x smaller pixels) and the "
            "round-5 loader pads once in collate instead of per-sample "
            "(resize_for_bucket), which removed the double full-frame "
            "materialization."
        ),
        "single_core_img_per_sec": {
            "float32": round(1e3 / pipeline_ms, 1),
            "uint8": round(1e3 / pipeline_u8_ms, 1),
            "train_default": round(1e3 / pipeline_train_ms, 1),
        },
        # Host cores per chip = per-image cost x device rate. cv2 decode and
        # resize release the GIL, so DetectionLoader's thread pool spreads
        # this across cores ~linearly until memory bandwidth intervenes.
        "implied_host_cores_per_chip": {
            "inference_at_%.0f_img_s" % DEVICE_INFER_IMG_S: round(
                pipeline_train_ms * DEVICE_INFER_IMG_S / 1e3, 2
            ),
            "training_at_%.0f_img_s" % DEVICE_TRAIN_IMG_S: round(
                pipeline_train_ms * DEVICE_TRAIN_IMG_S / 1e3, 2
            ),
        },
        "note": "cost measurement on a 1-core container; production TPU-VM "
        "hosts have 100+ vCPUs and the loader's ThreadPoolExecutor scales "
        "the GIL-free cv2 stages across them",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"metric": "host_pipeline_per_image_ms",
                      "value": result["per_image_ms"]["full_pipeline_train_default"],
                      "unit": "ms/image",
                      "detail": result["implied_host_cores_per_chip"]}))


if __name__ == "__main__":
    main()
