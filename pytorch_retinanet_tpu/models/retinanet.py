"""End-to-end RetinaNet: backbone → FPN → head, plus the user-facing wrapper.

TPU-native rebuild of the reference detector assembly
(``retinanet/models.py:21-288``). Two layers:

* :class:`RetinaNetModule` — the pure flax module. Input is a padded NHWC
  float batch in [0, 1]; normalization (ImageNet mean/std, reference
  config.py:12-13 applied via GeneralizedRCNNTransform at models.py:116) is
  folded into the traced graph. Output is ``(cls_logits [N, A, K],
  box_deltas [N, A, 4])`` in f32, index-aligned with
  :func:`..ops.generate_anchors` of the padded image size.

* :class:`Retinanet` — the reference-parity object API
  (``Retinanet(**kwargs)``, reference models.py:21): owns params,
  ``forward(images, targets) -> loss dict`` and ``predict(images) ->
  [{boxes, scores, labels}]`` (reference models.py:274 / :245). Internally both
  are jitted pure functions; the wrapper only does host-side resize/pad and
  final box rescale to the original image sizes (the reference delegates that
  to GeneralizedRCNNTransform.postprocess, models.py:271).

Resolution handling: the reference resizes shortest-side→min_size capped at
max_size and pads each batch to its own max (dynamic shapes). Here images are
padded into static resolution buckets — (ceil32(min_size), ceil32(max_size))
landscape or the transpose for portrait — so XLA compiles exactly two programs
and anchor grids are trace-time constants.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import config as C
from ..config import ifnone
from ..ops import (
    Detections,
    generate_anchors,
    generate_anchors_per_level,
    num_anchors_per_location,
    process_detections_multilevel_batch,
    rescale_boxes,
    retinanet_loss,
)
from .backbone import RESNET_SPECS, ResNetBackbone
from .fpn import FeaturePyramid
from .head import RetinaNetHead

Array = jnp.ndarray
Dtype = Any

__small__ = ["resnet18", "resnet34"]
__big__ = ["resnet50", "resnet101", "resnet152"]


class RetinaNetModule(nn.Module):
    """Pure flax detector: padded [N, H, W, 3] in [0,1] → (cls_logits, box_deltas)."""

    backbone_kind: str = "resnet50"
    num_classes: int = C.NUM_CLASSES
    freeze_bn: bool = C.FREEZE_BN
    prior: float = C.PRIOR
    channels: int = 256
    remat: bool = False
    stem_s2d: bool = False
    mean: Sequence[float] = tuple(C.MEAN)
    std: Sequence[float] = tuple(C.STD)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: Array,
        train: bool = False,
        return_levels: bool = False,
        stem_in: Array | None = None,
        feats_in: Dict[str, Array] | None = None,
    ) -> Tuple[Array, Array]:
        if feats_in is not None:
            # Precomputed C3/C4/C5 (the kernel-fused trunk,
            # models/fused_backbone.py) — skip the flax backbone entirely;
            # its params stay in the variables dict, unused this call.
            feats = {k: v.astype(self.dtype) for k, v in feats_in.items()}
        else:
            if stem_in is None:
                mean = jnp.asarray(self.mean, dtype=jnp.float32)
                std = jnp.asarray(self.std, dtype=jnp.float32)
                if images.dtype == jnp.uint8:
                    # uint8 wire format (serving sends raw bytes, 4x fewer
                    # than f32): fold the /255 into the constants so
                    # normalize stays ONE fused op.
                    mean, std = mean * 255.0, std * 255.0
                x = (images.astype(jnp.float32) - mean) / std
            else:
                # stem_in is the fused Pallas stem's output on the ALREADY
                # normalized image (kernels/stem_pallas.fused_stem
                # normalizes); images is ignored by the backbone then.
                x = images
            feats = ResNetBackbone(
                kind=self.backbone_kind,
                freeze_bn=self.freeze_bn,
                remat=self.remat,
                stem_s2d=self.stem_s2d,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="backbone",
            )(x, train, stem_in=stem_in)
        pyramid = FeaturePyramid(
            channels=self.channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fpn",
        )(feats)
        return RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=num_anchors_per_location(),
            channels=self.channels,
            prior=self.prior,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="head",
        )(pyramid, return_levels)


def fused_stem_applicable(module: RetinaNetModule, image_shape) -> bool:
    """Default gate for the fused Pallas stem (kernels/stem_pallas.py).

    True only on a single-device TPU context with the standard bf16 stem and
    a supported image shape. pallas_call has no SPMD partitioning rule: on a
    >1-device mesh the kernel would be replicated (full-batch gather +
    redundant compute per device) or fail to partition — multi-device callers
    that shard_map the kernel over the data axis themselves can still opt in
    explicitly."""
    import jax as _jax

    from ..kernels import fused_stem_supported, tpu_available

    return (
        tpu_available()
        and _jax.device_count() == 1
        and not module.stem_s2d
        and module.dtype == jnp.bfloat16
        and fused_stem_supported(image_shape)
    )


def apply_detector(
    module: RetinaNetModule,
    variables,
    images: Array,
    *,
    return_levels: bool = False,
    use_fused_stem: bool | None = None,
    use_fused_trunk: bool = False,
    mesh=None,
):
    """Inference forward pass with the fused Pallas stem when supported.

    The fused stem (kernels/stem_pallas.py) computes conv7x7s2+BN+ReLU+pool
    in one kernel — ~5x faster than the XLA composition on TPU — and is
    bit-compatible with inference semantics (running BN statistics). This is
    the single entry every inference call site (predict, eval-predict, bench,
    profilers) should use; training keeps the standard module path.

    On a single device the kernel is called directly. With ``mesh`` given
    (a >1-device mesh whose batch axis is 'data'), the kernel is wrapped in
    ``shard_map`` over the batch shards instead — pallas_call has no SPMD
    partitioning rule, so this is what makes the fast stem legal under a
    multi-chip mesh (parallel.sharding.make_sharded_stem; gate:
    sharded_stem_applicable).
    """
    from ..kernels import fused_stem

    sharded = False
    if use_fused_stem is None:
        if mesh is not None and mesh.devices.size > 1:
            from ..parallel.sharding import sharded_stem_applicable

            use_fused_stem = sharded = sharded_stem_applicable(
                module, images.shape, mesh
            )
        else:
            use_fused_stem = fused_stem_applicable(module, images.shape)
    if use_fused_stem:
        mean, std = module.mean, module.std
        if images.dtype == jnp.uint8:
            # uint8 wire format: fused_stem casts to f32 and normalizes, so
            # the /255 folds into the normalize constants (zero extra ops).
            mean = tuple(m * 255.0 for m in mean)
            std = tuple(s * 255.0 for s in std)
        if sharded:
            from ..parallel.sharding import make_sharded_stem

            stem = make_sharded_stem(module, mesh, mean=mean, std=std)(
                variables, images
            )
        else:
            stem = fused_stem(variables, images, mean=mean, std=std)
        if use_fused_trunk:
            # Opt-in kernel-fused trunk (models/fused_backbone.py): identity
            # bottlenecks as single VMEM-resident Pallas passes. Compiled
            # correct (TPU_SELFCHECK.json) but measured SLOWER end-to-end
            # than XLA's convs at the bench config (194 vs 215 img/s —
            # docs/ROOFLINE_BACKBONE.md "fused trunk" section), so default
            # off until the per-cell overheads are engineered away.
            from .fused_backbone import apply_trunk_fused, fused_trunk_applicable

            if fused_trunk_applicable(module.backbone_kind):
                feats = apply_trunk_fused(variables, stem, module.backbone_kind)
                return module.apply(
                    variables, images, False, return_levels, feats_in=feats
                )
        return module.apply(variables, images, False, return_levels, stem_in=stem)
    return module.apply(variables, images, False, return_levels)


def _ceil32(v: int) -> int:
    return int(math.ceil(v / 32.0) * 32)


def resolution_buckets(min_size: int, max_size: int) -> Tuple[Tuple[int, int], ...]:
    """The static padded shapes this model compiles for: landscape + portrait
    (+ square when min==max)."""
    lo, hi = _ceil32(min_size), _ceil32(max_size)
    if lo == hi:
        return ((lo, hi),)
    return ((lo, hi), (hi, lo))


def resize_for_bucket(
    image: np.ndarray, min_size: int, max_size: int, *, wire_dtype=np.float32
) -> Tuple[np.ndarray, Tuple[int, int], Tuple[int, int], Tuple[int, int]]:
    """Reference resize rule + wire-dtype convert, WITHOUT the bucket pad.

    The pad-free half of :func:`resize_to_bucket`: batching callers
    (data/loader.py) write the resized image straight into the batch buffer
    instead of materializing a per-sample full-bucket frame first (the
    double-pad cost LOADER.json attributed in round 5).

    Returns:
      (resized HWC array in ``wire_dtype``, resized (h, w), original (h, w),
       bucket (pad_h, pad_w) the image belongs in).
    """
    import cv2

    orig_h, orig_w = image.shape[:2]
    scale = min(min_size / min(orig_h, orig_w), max_size / max(orig_h, orig_w))
    new_h, new_w = int(round(orig_h * scale)), int(round(orig_w * scale))
    resized = cv2.resize(
        np.asarray(image), (new_w, new_h), interpolation=cv2.INTER_LINEAR
    )
    wire_dtype = np.dtype(wire_dtype)
    if wire_dtype == np.uint8:
        if resized.dtype != np.uint8:
            resized = np.clip(np.asarray(resized, np.float32) * 255.0, 0, 255).astype(
                np.uint8
            )
    elif resized.dtype == np.uint8:
        resized = resized.astype(np.float32) / 255.0
    else:
        resized = resized.astype(np.float32)
    if orig_h >= orig_w:  # portrait (or square) bucket
        pad_h, pad_w = _ceil32(max_size), _ceil32(min_size)
    else:
        pad_h, pad_w = _ceil32(min_size), _ceil32(max_size)
    pad_h, pad_w = max(pad_h, new_h), max(pad_w, new_w)
    return resized, (new_h, new_w), (orig_h, orig_w), (pad_h, pad_w)


def resize_to_bucket(
    image: np.ndarray, min_size: int, max_size: int, *, wire_dtype=np.float32
) -> Tuple[np.ndarray, Tuple[int, int], Tuple[int, int]]:
    """Host-side: reference resize rule + pad into the orientation bucket.

    Mirrors GeneralizedRCNNTransform (reference models.py:116): scale so the
    short side hits `min_size` unless the long side would exceed `max_size`.

    Args:
      image: HWC float or uint8 array (any channel count; RGB expected).
      wire_dtype: dtype of the padded output — ``np.float32`` (values in
        [0, 1], the default) or ``np.uint8`` (raw bytes; the device program
        normalizes from bytes). uint8 is the serving wire format: 4x fewer
        host→device bytes per request.

    Returns:
      (padded HWC array in ``wire_dtype``, resized (h, w) before padding,
       original (h, w)).
    """
    resized, (new_h, new_w), (orig_h, orig_w), (pad_h, pad_w) = resize_for_bucket(
        image, min_size, max_size, wire_dtype=wire_dtype
    )
    out = np.zeros((pad_h, pad_w, resized.shape[2]), resized.dtype)
    out[:new_h, :new_w] = resized
    return out, (new_h, new_w), (orig_h, orig_w)


class Retinanet:
    """Reference-parity detector object (reference models.py:21-288).

    Construction arguments mirror the reference ctor (``num_classes``,
    ``backbone_kind``, ``prior``, ``pretrained``, ``nms_thres``,
    ``score_thres``, ``max_detections_per_images``, ``freeze_bn``,
    ``min_size``, ``max_size``); defaults come from :mod:`..config` through
    ``ifnone`` exactly like reference models.py:94-107.
    """

    def __init__(
        self,
        num_classes: Optional[int] = None,
        backbone_kind: Optional[str] = None,
        prior: Optional[float] = None,
        pretrained: Optional[bool] = None,
        nms_thres: Optional[float] = None,
        score_thres: Optional[float] = None,
        max_detections_per_images: Optional[int] = None,
        freeze_bn: Optional[bool] = None,
        min_size: Optional[int] = None,
        max_size: Optional[int] = None,
        pretrained_path: Optional[str] = None,
        compute_dtype: Optional[str] = None,
        remat: bool = False,
        stem_s2d: bool = False,
        seed: int = 0,
        **unused,
    ):
        self.num_classes = ifnone(num_classes, C.NUM_CLASSES)
        self.backbone_kind = ifnone(backbone_kind, C.BACKBONE)
        if self.backbone_kind not in RESNET_SPECS:
            raise ValueError(
                f"backbone_kind must be one of {sorted(RESNET_SPECS)}, "
                f"got {self.backbone_kind!r}"
            )
        self.prior = ifnone(prior, C.PRIOR)
        self.pretrained = ifnone(pretrained, C.PRETRAINED_BACKBONE)
        self.nms_thres = ifnone(nms_thres, C.NMS_THRES)
        self.score_thres = ifnone(score_thres, C.SCORE_THRES)
        self.max_detections = ifnone(max_detections_per_images, C.MAX_DETECTIONS_PER_IMAGE)
        self.freeze_bn = ifnone(freeze_bn, C.FREEZE_BN)
        self.min_size = ifnone(min_size, C.MIN_IMAGE_SIZE)
        self.max_size = ifnone(max_size, C.MAX_IMAGE_SIZE)
        dtype = getattr(jnp, ifnone(compute_dtype, C.COMPUTE_DTYPE))

        self.module = RetinaNetModule(
            backbone_kind=self.backbone_kind,
            num_classes=self.num_classes,
            freeze_bn=self.freeze_bn,
            prior=self.prior,
            remat=remat,
            stem_s2d=stem_s2d,
            dtype=dtype,
        )
        init_size = resolution_buckets(self.min_size, self.max_size)[0]
        variables = self.module.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, init_size[0], init_size[1], 3), jnp.float32),
        )
        self.variables = variables
        if self.pretrained:
            from .zoo import fetch_backbone_weights

            resolved = fetch_backbone_weights(self.backbone_kind, pretrained_path)
            if resolved:
                self.load_torch_backbone(resolved)

        self._predict_fn = jax.jit(self._predict_impl)
        self._loss_fn = jax.jit(self._loss_impl)

    # ------------------------------------------------------------------ #
    # Functional core (used by the Trainer too)
    # ------------------------------------------------------------------ #
    def apply(self, variables, images: Array, train: bool = False):
        """Raw module application → (cls_logits, box_deltas)."""
        return self.module.apply(variables, images, train)

    def _loss_impl(self, variables, images, gt_boxes, gt_labels, gt_valid):
        cls_logits, box_deltas = self.module.apply(variables, images, False)
        anchors = jnp.asarray(generate_anchors(tuple(images.shape[1:3])))
        return retinanet_loss(
            cls_logits,
            box_deltas,
            anchors,
            gt_boxes,
            gt_labels,
            gt_valid,
            num_classes=self.num_classes,
        )

    def _predict_impl(self, variables, images, image_sizes) -> Detections:
        cls_levels, box_levels = apply_detector(
            self.module, variables, images, return_levels=True
        )
        anchors_levels = [
            jnp.asarray(a)
            for a in generate_anchors_per_level(tuple(images.shape[1:3]))
        ]
        return process_detections_multilevel_batch(
            cls_levels,
            box_levels,
            anchors_levels,
            image_sizes,
            score_thres=self.score_thres,
            nms_thres=self.nms_thres,
            max_detections=self.max_detections,
        )

    # ------------------------------------------------------------------ #
    # Reference-parity API
    # ------------------------------------------------------------------ #
    def forward(self, images, targets) -> Dict[str, Array]:
        """Training losses (reference models.py:274-288).

        Two input forms:
          * padded batch: ``images [B,H,W,3]`` + targets dict
            {"boxes" [B,N,4], "labels" [B,N], "valid" [B,N]} — the data
            pipeline's native form;
          * ragged reference form: a list of HWC images + a list of per-image
            target dicts {"boxes" [n,4], "labels" [n]} (the reference's
            ``forward(List[Tensor], List[Dict])``) — resized/padded here.
        """
        if isinstance(images, (list, tuple)):
            images, targets = self._pad_ragged(images, targets)
        return self._loss_fn(
            self.variables,
            images,
            targets["boxes"],
            targets["labels"],
            targets["valid"],
        )

    def _pad_ragged(self, images, targets):
        """Reference-style ragged inputs → fixed-shape padded batch.

        A MIXED-orientation list letterboxes every image up to the batch max
        (max_size x max_size) — the same pad-to-batch-max the reference's
        GeneralizedRCNNTransform applies to every batch, but it compiles a
        third (larger) XLA program here. The data pipeline avoids this by
        grouping batches by orientation (data/loader.py); callers feeding
        ragged lists directly should group likewise when throughput matters.
        """
        from ..data.loader import pad_targets  # lazy: loader imports this module

        padded_imgs, padded_boxes, padded_labels, padded_valid = [], [], [], []
        for img, tgt in zip(images, targets):
            img = np.asarray(img)
            orig_h, orig_w = img.shape[:2]
            padded, (new_h, new_w), _ = resize_to_bucket(
                img, self.min_size, self.max_size
            )
            boxes = np.asarray(tgt["boxes"], np.float32).reshape(-1, 4)
            if len(boxes):
                sx, sy = new_w / orig_w, new_h / orig_h
                boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
            b, l, v = pad_targets(
                boxes, np.asarray(tgt["labels"]).reshape(-1), C.MAX_GT_BOXES
            )
            padded_imgs.append(padded)
            padded_boxes.append(b)
            padded_labels.append(l)
            padded_valid.append(v)
        max_h = max(i.shape[0] for i in padded_imgs)
        max_w = max(i.shape[1] for i in padded_imgs)
        batch = np.zeros((len(padded_imgs), max_h, max_w, 3), np.float32)
        for i, im in enumerate(padded_imgs):
            batch[i, : im.shape[0], : im.shape[1]] = im
        return jnp.asarray(batch), {
            "boxes": jnp.asarray(np.stack(padded_boxes)),
            "labels": jnp.asarray(np.stack(padded_labels)),
            "valid": jnp.asarray(np.stack(padded_valid)),
        }

    __call__ = forward

    def predict(self, images: List[np.ndarray]) -> List[Dict[str, np.ndarray]]:
        """Detect objects on raw HWC images (reference models.py:245-272).

        Images are resized/padded host-side into the model's resolution
        buckets (grouped by orientation so each bucket is one compiled
        program), and final boxes are rescaled to each image's original size.
        """
        out: List[Optional[Dict[str, np.ndarray]]] = [None] * len(images)
        groups: Dict[Tuple[int, int], List[int]] = {}
        prepped = []
        for i, im in enumerate(images):
            padded, resized_hw, orig_hw = resize_to_bucket(
                np.asarray(im), self.min_size, self.max_size
            )
            prepped.append((padded, resized_hw, orig_hw))
            groups.setdefault(padded.shape[:2], []).append(i)

        for bucket, idxs in groups.items():
            batch = jnp.asarray(np.stack([prepped[i][0] for i in idxs]))
            sizes = jnp.asarray(
                np.array([prepped[i][1] for i in idxs], np.float32)
            )
            det = self._predict_fn(self.variables, batch, sizes)
            det = jax.device_get(det)
            for row, i in enumerate(idxs):
                n = int(det.valid[row].sum())
                boxes = np.asarray(
                    rescale_boxes(
                        det.boxes[row, :n],
                        np.asarray(prepped[i][1], np.float32),
                        np.asarray(prepped[i][2], np.float32),
                    )
                )
                out[i] = {
                    "boxes": boxes,
                    "scores": np.asarray(det.scores[row, :n]),
                    "labels": np.asarray(det.labels[row, :n]),
                }
        return out  # type: ignore[return-value]

    # ------------------------------------------------------------------ #
    # Checkpoint interop
    # ------------------------------------------------------------------ #
    def load_torch_backbone(self, path: str) -> None:
        """Load torchvision ImageNet ResNet weights into the backbone
        (replaces the reference's ctor-time model-zoo download,
        backbone.py:269-274)."""
        from .converter import load_torch_resnet

        self.variables = load_torch_resnet(self.variables, path, self.backbone_kind)

    def load_torch_state_dict(self, state_dict_or_path) -> None:
        """Load a FULL reference-trained detector checkpoint (the schema of
        ``torch.save(litModel.net.state_dict())``, reference demo cells 23/25)
        — backbone + FPN + head, shape-checked (models/converter.py)."""
        from .converter import load_torch_retinanet

        self.variables = load_torch_retinanet(
            self.variables, state_dict_or_path, self.backbone_kind
        )

    def to_torch_state_dict(self):
        """Export the detector into the reference's ``state_dict`` schema
        (flat ``backbone.backbone.* / fpn.* / retinanet_head.*`` keys, OIHW
        numpy weights) — the reverse migration path: a reference
        ``Retinanet`` loads the result with ``load_state_dict`` directly
        (reference models.py:21; see models/converter.py
        flax_retinanet_to_torch)."""
        from .converter import flax_retinanet_to_torch

        return flax_retinanet_to_torch(self.variables, self.backbone_kind)

    def save_torch_state_dict(self, path: str) -> None:
        """``torch.save`` the reference-schema export at ``path``."""
        from .converter import save_torch_retinanet

        save_torch_retinanet(self.variables, path, self.backbone_kind)

    def state_dict(self):
        """The full variable pytree (params + batch stats)."""
        return self.variables

    def load_state_dict(self, variables) -> None:
        """Replace model weights. Accepts either this framework's variable
        pytree, or a reference-schema flat torch ``state_dict`` (keys like
        ``backbone.backbone.conv1.weight``) which is converted on the fly —
        mirroring the reference's ``Retinanet(...).load_state_dict(torch.load(p))``
        reload flow (reference models.py:21 + demo cell 25)."""
        if isinstance(variables, dict) and variables and all(
            isinstance(k, str) and "." in k for k in variables
        ):
            self.load_torch_state_dict(variables)
        else:
            self.variables = variables
