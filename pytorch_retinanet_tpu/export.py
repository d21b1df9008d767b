"""Serving export: the compiled inference program as a portable artifact.

The reference's deployment story is ``torch.save(state_dict)`` + rebuilding
the model in Python (demo cells 23/25). A TPU serving stack wants the
COMPILED program, not a Python object graph: this module exports the fused
inference step (normalize → fused stem → trunk → head → postprocess,
``models.retinanet.apply_detector`` semantics) through ``jax.export`` into a
single serialized StableHLO artifact with the weights baked in as constants.
The artifact is loadable from any JAX process with no framework code on the
import path beyond jax itself — the moral equivalent of a TorchScript /
SavedModel bundle.

Shapes are static by design (the bucket system, docs/DESIGN.md §1): one
artifact per (batch, resolution bucket). Export on the machine type you will
serve on — lowered programs are platform-specific (a TPU artifact contains
the Mosaic kernels; a CPU artifact the XLA:CPU lowering).

Usage::

    from pytorch_retinanet_tpu.export import export_inference, load_exported

    blob = export_inference(net, batch_size=8)      # bytes
    open("r50_800x1344_b8.stablehlo", "wb").write(blob)

    infer = load_exported(blob)                     # or a file path
    dets = infer(images, image_sizes)               # dict of arrays

CLI: ``python tools/export_model.py --backbone resnet50 --batch 8``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def export_inference(
    net,
    batch_size: int,
    bucket: Optional[Tuple[int, int]] = None,
    platforms: Optional[Sequence[str]] = None,
    wire_dtype: str = "float32",
) -> bytes:
    """Serialize the fused inference step for one (batch, bucket) config.

    Args:
      net: a :class:`..models.Retinanet` (weights are captured as constants).
      batch_size: static batch size of the exported program.
      bucket: (H, W) padded input shape; defaults to the model's landscape
        bucket (``resolution_buckets(min_size, max_size)[0]``).
      platforms: lowering platforms (default: the current backend).

      wire_dtype: dtype of the image input — "float32" (values in [0, 1])
        or "uint8" (raw bytes; normalize-from-bytes folds into the traced
        graph). uint8 cuts host->device transfer 4x per request — the
        serving wire format (tools/bench_latency.py measures it).

    Returns:
      Serialized ``jax.export`` artifact bytes. Inputs of the exported
      program: ``images [B, H, W, 3]`` (f32 in [0, 1], or uint8 raw),
      ``image_sizes [B, 2] f32`` (resized-image (h, w) per row, for box
      clipping). Outputs: ``(boxes [B, D, 4], scores [B, D], labels [B, D],
      valid [B, D])``.
    """
    from .models.retinanet import resolution_buckets

    if bucket is None:
        bucket = resolution_buckets(net.min_size, net.max_size)[0]
    h, w = int(bucket[0]), int(bucket[1])
    variables = net.variables

    def infer(images, image_sizes):
        det = net._predict_impl(variables, images, image_sizes)
        return det.boxes, det.scores, det.labels, det.valid

    if wire_dtype not in ("float32", "uint8"):
        raise ValueError(f"wire_dtype must be float32 or uint8, got {wire_dtype!r}")
    args = (
        jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.dtype(wire_dtype)),
        jax.ShapeDtypeStruct((batch_size, 2), jnp.float32),
    )
    exported = jax.export.export(
        jax.jit(infer), platforms=list(platforms) if platforms else None
    )(*args)
    return bytes(exported.serialize())


def save_exported(
    net,
    path: str,
    batch_size: int,
    bucket: Optional[Tuple[int, int]] = None,
    platforms: Optional[Sequence[str]] = None,
    wire_dtype: str = "float32",
) -> str:
    """``export_inference`` to a file; returns the path.

    Also writes a ``<path>.json`` sidecar recording the TRUE resize rule
    (min/max sizes) and model facts — the padded bucket dims are ceil32'd so
    they cannot recover e.g. an 800/1333 resize rule (it would serve as
    800/1344, a slightly different input distribution for long images)."""
    import json

    blob = export_inference(net, batch_size, bucket, platforms, wire_dtype)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    meta = {
        "min_size": int(net.min_size),
        "max_size": int(net.max_size),
        "batch_size": int(batch_size),
        "num_classes": int(net.num_classes),
        "backbone": net.backbone_kind,
        "score_thres": float(net.score_thres),
        "nms_thres": float(net.nms_thres),
        "wire_dtype": wire_dtype,
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_exported(blob_or_path: Union[bytes, str]):
    """Rehydrate an exported inference program.

    Returns a callable ``infer(images, image_sizes) -> {"boxes", "scores",
    "labels", "valid"}`` running the deserialized compiled program.
    """
    meta = None
    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
        sidecar = str(blob_or_path) + ".json"
        if os.path.exists(sidecar):
            import json

            with open(sidecar) as f:
                meta = json.load(f)
    else:
        blob = bytes(blob_or_path)
    exported = jax.export.deserialize(blob)

    wire = exported.in_avals[0].dtype

    def infer(images, image_sizes):
        boxes, scores, labels, valid = exported.call(
            jnp.asarray(images, wire), jnp.asarray(image_sizes, jnp.float32)
        )
        return {
            "boxes": np.asarray(boxes),
            "scores": np.asarray(scores),
            "labels": np.asarray(labels),
            "valid": np.asarray(valid),
        }

    def dispatch(images, image_sizes):
        """Async form: enqueue the program and return DEVICE arrays
        (boxes, scores, labels, valid) without waiting — JAX's async
        dispatch overlaps this request's compute with the previous
        request's host fetch. Use for request pipelining (examples/serve.py);
        ``np.asarray``/``jax.device_get`` the results to fetch."""
        return exported.call(
            jnp.asarray(images, wire), jnp.asarray(image_sizes, jnp.float32)
        )

    infer.dispatch = dispatch
    infer.in_avals = exported.in_avals
    infer.platforms = exported.platforms
    infer.meta = meta  # sidecar metadata (true resize rule), None if absent
    return infer
