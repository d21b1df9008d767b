"""End-to-end example: train + evaluate RetinaNet on a CSV dataset.

Mirrors the reference demo notebook's flow (demo.ipynb: VOC-XML → CSV →
fit → test → reload → predict) on the TPU-native stack. Usage:

    python examples/train_csv.py --csv train.csv --val-csv val.csv \
        --num-classes 4 --epochs 10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from pytorch_retinanet_tpu import OmegaConf, RetinaNetModel, Trainer
from pytorch_retinanet_tpu.utils import enable_compilation_cache, seed_everything

enable_compilation_cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True, help="training CSV (reference schema)")
    ap.add_argument("--val-csv", default=None)
    ap.add_argument("--test-csv", default=None)
    ap.add_argument("--num-classes", type=int, required=True)
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--min-size", type=int, default=800)
    ap.add_argument("--max-size", type=int, default=1333)
    ap.add_argument("--checkpoint-dir", default="checkpoints")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument(
        "--spatial", type=int, default=1,
        help="shard image HEIGHT over N chips during training (spreads one "
        "image's backbone FLOPs/activations; freeze_bn only — see "
        "docs/DESIGN.md §21). batch must divide the remaining data axis.",
    )
    ap.add_argument(
        "--accumulate", type=int, default=1,
        help="gradient accumulation window (Lightning "
        "accumulate_grad_batches semantics: window-mean grads, clip at "
        "optimizer-step time, partial epoch-end windows flushed)",
    )
    args = ap.parse_args()

    seed_everything(args.seed)
    conf = OmegaConf.create(
        {
            "model": {
                "backbone_kind": args.backbone,
                "num_classes": args.num_classes,
                "min_size": args.min_size,
                "max_size": args.max_size,
                "pretrained": False,
            },
            "dataset": {
                "kind": "csv",
                "trn_paths": args.csv,
                "valid_paths": args.val_csv or False,
                "test_paths": args.test_csv or args.val_csv or args.csv,
            },
            "dataloader": {
                "train_bs": args.batch_size,
                "valid_bs": args.batch_size,
                "test_bs": args.batch_size,
                "args": {"num_workers": 8},
            },
            "transforms": [
                {"class_name": "albumentations.HorizontalFlip", "params": {"p": 0.5}}
            ],
            "optimizer": {
                "class_name": "torch.optim.SGD",
                "params": {"lr": args.lr, "momentum": 0.9, "weight_decay": 1e-4},
            },
            "scheduler": {
                "class_name": "torch.optim.lr_scheduler.CosineAnnealingLR",
                "params": {"T_max": args.epochs},
                "interval": "epoch",
                "frequency": 1,
                "monitor": False,
            },
        }
    )

    model = RetinaNetModel(conf)
    kwargs = {}
    if args.spatial > 1:
        from pytorch_retinanet_tpu.parallel import make_train_mesh

        kwargs["mesh"] = make_train_mesh(spatial=args.spatial)
    trainer = Trainer(
        max_epochs=args.epochs,
        checkpoint_dir=args.checkpoint_dir,
        accumulate_grad_batches=args.accumulate,
        **kwargs,
    )
    metrics = trainer.fit(model)
    print("train metrics:", {k: round(v, 4) for k, v in metrics.items()})
    results = trainer.test(model)
    print("test results:", results)


if __name__ == "__main__":
    main()
