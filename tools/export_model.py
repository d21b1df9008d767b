"""CLI: export the compiled inference program as a serving artifact.

Builds a :class:`Retinanet`, optionally loads weights, and writes one
``jax.export`` StableHLO artifact per resolution bucket (landscape +
portrait), each with the weights baked in. See
``pytorch_retinanet_tpu/export.py`` for the artifact contract.

    python tools/export_model.py --backbone resnet50 --num-classes 90 \
        --batch 8 --out-dir exported/
    python tools/export_model.py --check exported/resnet50_800x1344_b8.stablehlo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--num-classes", type=int, default=90)
    ap.add_argument("--min-size", type=int, default=800)
    ap.add_argument("--max-size", type=int, default=1333)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--wire-dtype", default="float32",
                    choices=["float32", "uint8"],
                    help="image input dtype of the exported program; uint8 "
                    "transfers 4x fewer bytes per request (serving wire)")
    ap.add_argument("--torch-backbone", default=None,
                    help="torchvision ResNet .pth to load into the backbone")
    ap.add_argument("--out-dir", default="exported")
    ap.add_argument("--check", default=None,
                    help="load an existing artifact and run a smoke batch")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from pytorch_retinanet_tpu.export import load_exported, save_exported
    from pytorch_retinanet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if args.check:
        infer = load_exported(args.check)
        (b, h, w, _), _ = (a.shape for a in infer.in_avals)
        wire = infer.in_avals[0].dtype
        images = np.random.default_rng(0).random((b, h, w, 3)).astype(np.float32)
        if wire == np.uint8:
            images = (images * 255).astype(np.uint8)
        sizes = np.tile(np.asarray([[h, w]], np.float32), (b, 1))
        out = infer(images, sizes)
        print(
            f"ok: platforms={infer.platforms} batch={b} bucket={h}x{w} "
            f"detections_valid={int(out['valid'].sum())}"
        )
        return

    from pytorch_retinanet_tpu.models import Retinanet
    from pytorch_retinanet_tpu.models.retinanet import resolution_buckets

    net = Retinanet(
        num_classes=args.num_classes,
        backbone_kind=args.backbone,
        min_size=args.min_size,
        max_size=args.max_size,
        pretrained=False,
    )
    if args.torch_backbone:
        net.load_torch_backbone(args.torch_backbone)

    for bucket in resolution_buckets(args.min_size, args.max_size):
        tag = "_u8" if args.wire_dtype == "uint8" else ""
        name = f"{args.backbone}_{bucket[0]}x{bucket[1]}_b{args.batch}{tag}.stablehlo"
        path = os.path.join(args.out_dir, name)
        save_exported(net, path, args.batch, bucket, wire_dtype=args.wire_dtype)
        print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
