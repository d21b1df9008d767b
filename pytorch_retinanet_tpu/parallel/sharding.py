"""Spatial + tensor-parallel inference sharding over a named device mesh.

The reference is single-device-first: its NCCL layer never shards compute
(SURVEY.md §2.3 — `utils/coco/detection_utils.py:300-327` is vestigial), so
data parallelism (`parallel.make_mesh`) already exceeds parity. This module
adds the two model-sharding axes that matter for a conv detector on TPU pods,
following the scaling-book recipe — pick a mesh, annotate shardings, let
XLA's SPMD partitioner insert the collectives, profile:

* **spatial partitioning** (mesh axis ``"spatial"``): the image/feature-map
  height dimension is sharded across devices; GSPMD inserts the conv halo
  exchanges (``collective-permute`` of boundary rows over ICI). One image's
  conv FLOPs spread over the axis — the single-image serving-latency lever,
  the detector analog of sequence parallelism (SURVEY.md §5.7).
* **tensor parallelism** (mesh axis ``"model"``): conv kernels shard their
  output-channel dimension (with their bias / frozen-BN vectors co-sharded);
  GSPMD propagates the channel sharding through the elementwise BN/ReLU
  chain and re-shards at the next conv — Megatron-style column parallelism
  for convolutions, without hand-written collectives.

Tensor parallelism is inference-only (training scales data-parallel: the
model is ~38 M params — replication is free; the batch is the big axis).
Spatial partitioning also serves TRAINING via :func:`make_split_forward` +
``parallel.make_train_mesh`` — the backward pass stays height-sharded
through the backbone, spreading one image's activation memory over the axis
(the measured-faster alternative to remat for high-resolution training,
docs/ROOFLINE_TRAIN.md). Correctness is validated against the single-device
forward on the virtual CPU mesh (tests/test_sharding.py); single-chip
hardware here means on-TPU speedups are design-validated, not benchmarked.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "InferenceMeshPlan",
    "make_inference_mesh",
    "make_sharded_stem",
    "make_split_forward",
    "shard_variables",
    "sharded_stem_applicable",
    "build_sharded_forward",
]

# 1-D per-channel parameter leaves that co-shard with their conv kernel's
# output-channel dimension under tensor parallelism.
_CHANNEL_VECTOR_NAMES = ("bias", "scale", "mean", "var")


@dataclasses.dataclass(frozen=True)
class InferenceMeshPlan:
    """A (data, spatial, model) mesh plus the canonical inference shardings."""

    mesh: Mesh

    @property
    def image_sharding(self) -> NamedSharding:
        """NHWC image batches: batch over 'data', height over 'spatial'."""
        return NamedSharding(self.mesh, P("data", "spatial", None, None))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def axis_size(self, name: str) -> int:
        return self.mesh.shape[name]


def make_inference_mesh(
    devices: Optional[Sequence[Any]] = None,
    *,
    data: int = 1,
    spatial: int = 1,
    model: int = 1,
) -> InferenceMeshPlan:
    """Build a named ``(data, spatial, model)`` mesh over the first
    ``data*spatial*model`` devices.

    Axis order is data-outermost so the batch axis lands on the slowest
    mesh dimension (DCN-friendly when multi-slice) and the model/spatial
    collectives ride neighboring ICI links. Size-1 axes are kept in the
    mesh so every PartitionSpec in this module is layout-independent.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    need = data * spatial * model
    if devs.size < need:
        raise ValueError(
            f"mesh {data}x{spatial}x{model} needs {need} devices, "
            f"have {devs.size}"
        )
    mesh = Mesh(
        devs.flatten()[:need].reshape(data, spatial, model),
        ("data", "spatial", "model"),
    )
    return InferenceMeshPlan(mesh)


def shard_variables(
    variables: Any, mesh: Mesh, tp_axis: str = "model"
) -> Any:
    """A NamedSharding pytree for detector variables under tensor parallelism.

    Rule: 4-D conv kernels ``[kh, kw, cin, cout]`` shard ``cout`` over
    ``tp_axis`` when divisible by the axis size; their sibling 1-D
    per-channel vectors (bias and frozen-BN scale/bias/mean/var) co-shard;
    everything else (the head predictor whose ``A*(K)`` channels rarely
    divide, embeddings, scalars) replicates. GSPMD propagates the rest —
    no per-layer annotations needed.
    """
    size = mesh.shape[tp_axis]

    def spec(path, leaf) -> P:
        if size <= 1:
            return P()
        name = ""
        if path:
            last = path[-1]
            name = getattr(last, "key", getattr(last, "name", ""))
        ndim = getattr(leaf, "ndim", 0)
        shape = getattr(leaf, "shape", ())
        if name == "kernel" and ndim == 4 and shape[-1] % size == 0:
            return P(None, None, None, tp_axis)
        if (
            name in _CHANNEL_VECTOR_NAMES
            and ndim == 1
            and shape
            and shape[0] % size == 0
        ):
            return P(tp_axis)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec(p, x)), variables
    )


# The deepest backbone stride: the spatial axis must keep >= 1 feature row
# per device at C5, or GSPMD's halo/padding handling of the sub-row shards
# degrades (measured on the virtual mesh: sub-row C5 shards corrupt every
# pyramid level through the FPN top-down path). UNEVEN divisions are fine:
# C5 rows that don't divide the axis — including a trailing device whose
# shard is entirely GSPMD padding, e.g. 5 rows over spatial=4 = (2,2,1,0) —
# measured exact to 2e-6 vs single-device (tests/test_sharding.py's
# test_spatial_uneven_and_empty_shards); only rows < spatial corrupts.
_DEEPEST_STRIDE = 32


def make_split_forward(module, mesh: Mesh, *, gather_spec: Optional[P] = P("data")):
    """The spatial-partitioning split forward, shared by every spatial
    caller (:func:`build_sharded_forward`, the Trainer's spatial train path,
    the driver dry run): run the backbone on height-sharded images — GSPMD
    inserts the conv halo exchanges — then constrain C3/C4/C5 to
    ``gather_spec`` (height gathered; ``None`` skips the constraint) before
    the small FPN/head maps, where full rows beat halo exchanges and sub-row
    C5 shards are the one regime GSPMD gets wrong (see ``_DEEPEST_STRIDE``).

    Returns ``forward(variables, images, return_levels=True)``. Under
    ``jax.grad`` the constraint is identity + resharding, so the backward
    pass stays spatially sharded through the backbone — this is the
    spatial-parallel TRAINING forward too (``parallel.make_train_mesh``).
    """
    import jax.numpy as jnp

    from ..models.backbone import ResNetBackbone

    backbone = ResNetBackbone(
        kind=module.backbone_kind,
        freeze_bn=module.freeze_bn,
        remat=module.remat,
        stem_s2d=module.stem_s2d,
        dtype=module.dtype,
        param_dtype=module.param_dtype,
    )
    gathered = None if gather_spec is None else NamedSharding(mesh, gather_spec)
    mean = jnp.asarray(module.mean, jnp.float32)
    std = jnp.asarray(module.std, jnp.float32)

    def forward(variables, images, return_levels: bool = True):
        # uint8 wire: fold /255 into the constants (models.retinanet does
        # the same) so bytes normalize in one fused op.
        m, s = (mean * 255.0, std * 255.0) if images.dtype == jnp.uint8 else (mean, std)
        x = (images.astype(jnp.float32) - m) / s
        bvars = {"params": variables["params"]["backbone"]}
        if "batch_stats" in variables:
            bvars["batch_stats"] = variables["batch_stats"]["backbone"]
        feats = backbone.apply(bvars, x, False)
        if gathered is not None:
            feats = jax.lax.with_sharding_constraint(
                feats, jax.tree_util.tree_map(lambda _: gathered, feats)
            )
        return module.apply(
            variables, images, False, return_levels, feats_in=feats
        )

    return forward


def _stem_subtree(variables):
    """Just the stem leaves (conv + BN params/stats) — what
    kernels.stem_pallas.fused_stem reads. Passing only these through
    shard_map keeps its replicated-input gather to ~10 KB instead of the
    whole parameter tree."""
    p = variables["params"]
    s = variables["batch_stats"]
    if "backbone" in p:
        p, s = p["backbone"], s["backbone"]
    return {
        "params": {"stem_conv": p["stem_conv"], "stem_bn": p["stem_bn"]},
        "batch_stats": {"stem_bn": s["stem_bn"]},
    }


def sharded_stem_applicable(module, image_shape, mesh: Mesh, axis: str = "data") -> bool:
    """Gate for :func:`make_sharded_stem` — the multi-device analog of
    models.retinanet.fused_stem_applicable.

    The Pallas stem is batch-parallel, so it is legal on any mesh where the
    batch divides the ``axis`` extent and the image rows are whole per device:
    a 'spatial' axis > 1 height-shards the images (partial rows — the stem's
    halo DMA assumes full height), so it disqualifies. A 'model' axis > 1 is
    fine — the stem recomputes redundantly across it (2-4 ms of work on a
    ~10 KB weight slice), exactly like replicated-parameter layers do."""
    import jax.numpy as jnp

    from ..kernels import fused_stem_supported, tpu_available

    if mesh is None or axis not in mesh.axis_names:
        return False
    if "spatial" in mesh.axis_names and mesh.shape["spatial"] > 1:
        return False
    return (
        tpu_available()
        and not module.stem_s2d
        and module.dtype == jnp.bfloat16
        and fused_stem_supported(image_shape)
        and image_shape[0] % mesh.shape[axis] == 0
    )


def make_sharded_stem(
    module,
    mesh: Mesh,
    *,
    axis: str = "data",
    interpret: bool = False,
    mean=None,
    std=None,
):
    """Batch-sharded fused Pallas stem: ``pallas_call`` has no SPMD
    partitioning rule, so under a >1-device mesh the kernel must be wrapped in
    ``shard_map`` over the batch axis — each device runs the kernel on its
    local batch shard, no collectives (the stem is embarrassingly
    batch-parallel). This upgrades the r2 multi-device gate (which simply
    fell back to the XLA stem) into a working multi-chip fast path.

    Returns ``stem(variables, images) -> pooled stem output`` whose result
    feeds ``RetinaNetModule.__call__(stem_in=...)``; differentiable (the
    kernel's custom VJP recomputes through the XLA composition per shard).
    Callers gate with :func:`sharded_stem_applicable`.
    """
    from functools import partial as _partial

    from ..kernels import fused_stem

    mean = module.mean if mean is None else mean
    std = module.std if std is None else std

    @_partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def _stem(stem_vars, images):
        return fused_stem(
            stem_vars, images, mean=mean, std=std, interpret=interpret,
        )

    def stem(variables, images):
        return _stem(_stem_subtree(variables), images)

    return stem


def build_sharded_forward(
    module,
    variables: Any,
    plan: InferenceMeshPlan,
    *,
    tensor_parallel: bool = True,
):
    """A jitted, mesh-sharded detector forward (per-level head outputs).

    Places ``variables`` on the mesh (TP-sharded kernels when
    ``tensor_parallel`` and the 'model' axis is >1, else replicated) and
    returns ``(forward, place_images)``: call ``place_images(images)`` to
    device_put an NHWC batch with the batch axis over 'data' and height over
    'spatial', then ``forward(images)`` → per-level ``(cls, box)`` outputs.
    XLA GSPMD inserts the halo exchanges / channel collectives; there are no
    hand-written collectives to keep in sync with the model.

    Spatial partitioning covers the backbone trunk — where H is large and
    ~75% of the FLOPs live (docs/ROOFLINE.md) — and the C3/C4/C5 features
    then gather H (``with_sharding_constraint``) so the small FPN/P6/P7/head
    maps compute with full rows: sub-row shards at the deep strides are where
    GSPMD's conv partitioning loses exactness (see ``place_images``'s guard).

    When the 'spatial' axis is 1 the stem goes through
    ``models.retinanet.apply_detector`` with ``mesh=`` — i.e. the fused
    Pallas stem runs shard_mapped over the batch on TPU
    (:func:`make_sharded_stem`); height-sharded images keep the XLA stem
    (the kernel's halo DMA assumes whole image rows per device).
    """
    if tensor_parallel and plan.axis_size("model") > 1:
        shardings = shard_variables(variables, plan.mesh)
    else:
        shardings = jax.tree_util.tree_map(
            lambda _: plan.replicated, variables
        )
    placed = jax.device_put(variables, shardings)
    spatial = plan.axis_size("spatial")

    # Gather the height shards at C3/C4/C5: their rows are few and the
    # FPN/head FLOPs small — full rows beat halo exchanges there.
    split = make_split_forward(
        module, plan.mesh, gather_spec=P("data") if spatial > 1 else None
    )

    @jax.jit
    def forward(images):
        if spatial == 1:
            from ..models.retinanet import apply_detector

            return apply_detector(
                module, placed, images, return_levels=True, mesh=plan.mesh
            )
        return split(placed, images, return_levels=True)

    def place_images(images):
        h = images.shape[1]
        if spatial > 1 and h // _DEEPEST_STRIDE < spatial:
            raise ValueError(
                f"spatial axis {spatial} too large for H={h}: C5 has "
                f"{h // _DEEPEST_STRIDE} rows and each spatial shard needs "
                f">= 1 (use spatial <= H/{_DEEPEST_STRIDE})"
            )
        if images.shape[0] % plan.axis_size("data"):
            raise ValueError(
                f"batch {images.shape[0]} not divisible by data axis "
                f"{plan.axis_size('data')}"
            )
        return jax.device_put(images, plan.image_sharding)

    return forward, place_images
