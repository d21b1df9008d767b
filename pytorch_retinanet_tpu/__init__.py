"""pytorch_retinanet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) RetinaNet framework.

Brand-new framework with the capabilities of benihime91/pytorch_retinanet
(reference mounted read-only at /root/reference), redesigned TPU-first:

* fixed-shape, fused detection ops (:mod:`.ops`) instead of per-image python loops
* flax ResNet/FPN/head modules in NHWC bfloat16 (:mod:`.models`)
* a pjit'd train/eval harness over a ``jax.sharding.Mesh`` (:mod:`.engine`)
* host-side data pipelines for coco / pascal / csv dataset kinds (:mod:`.data`)
* a native COCO mAP evaluator (:mod:`.eval`) — pycocotools-compatible bbox metrics

Public surface parity with the reference (README.md:40-59):

    from pytorch_retinanet_tpu import OmegaConf, RetinaNetModel, Trainer
    conf = OmegaConf.load("hparams.yaml")
    model = RetinaNetModel(conf)
    trainer = Trainer(max_epochs=10)
    trainer.fit(model)
    trainer.test(model)
"""

from .config import ConfigDict, OmegaConf, default_hparams, ifnone, load_config

__version__ = "0.1.0"

__all__ = [
    "ConfigDict",
    "OmegaConf",
    "default_hparams",
    "ifnone",
    "load_config",
    "Retinanet",
    "RetinaNetModel",
    "Trainer",
    "AnchorGenerator",
]


def __getattr__(name):
    # Lazy imports keep `import pytorch_retinanet_tpu` light (no jax/flax import
    # cost until a model or trainer is actually requested).
    if name in ("Retinanet", "AnchorGenerator"):
        from . import models

        return getattr(models, name)
    if name in ("RetinaNetModel", "Trainer"):
        from . import engine

        return getattr(engine, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
