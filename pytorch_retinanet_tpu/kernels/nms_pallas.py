"""Pallas TPU kernel: greedy NMS over the pre-NMS candidate set, all in VMEM.

The reference's only native device op is torchvision's C++/CUDA ``nms``,
launched once per class from a python loop (reference retinanet/models.py:210).
The TPU postprocess collapses that to ONE suppression over class-offset boxes
(ops/nms.py); this module is its Pallas implementation: the [K, K] IoU matrix,
the suppression fixpoint and the keep mask all live in VMEM for the whole
kernel — zero HBM round-trips between fixpoint iterations, which is the one
fusion XLA cannot be relied on to find across a ``while_loop``.

K is the pre-NMS candidate count (default 1000 → padded to 1024 lanes);
[1024 x 1024] f32 is 4 MB — comfortably inside the ~16 MB VMEM budget.

The fixpoint iterates ``keep[j] = valid[j] & no kept i<j suppresses j`` from
``keep = valid``; it converges to exactly the sequential greedy result in
(suppression-chain-depth) iterations (see ops/nms.py docstring for the
argument). Parity with torchvision::nms and with the pure-XLA path is tested
in tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, iou_thr: float, k: int):
    boxes = boxes_ref[:]  # [K, 4] f32 (lane-padded by BlockSpec)
    valid = valid_ref[:] > 0  # [K, 1] bool

    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    x2, y2 = boxes[:, 2:3], boxes[:, 3:4]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # [K, 1]

    # Pairwise IoU [K, K] on the VPU (8x128 tiles), built from rank-2 outers.
    ix = jnp.maximum(
        jnp.minimum(x2, x2.T) - jnp.maximum(x1, x1.T), 0.0
    )
    iy = jnp.maximum(
        jnp.minimum(y2, y2.T) - jnp.maximum(y1, y1.T), 0.0
    )
    inter = ix * iy
    union = area + area.T - inter
    iou = inter / jnp.maximum(union, 1e-12)

    idx = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    jdx = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    vrow = valid  # [K, 1]
    suppress = (
        (iou > iou_thr) & (idx < jdx) & vrow & vrow.reshape(1, k)
    )  # [K, K]: i can suppress j

    valid_col = valid.reshape(1, k)  # [1, K]

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        # suppressed[j] = any_i suppress[i, j] & keep[i]
        suppressed = jnp.max(
            jnp.where(suppress & keep.reshape(k, 1), 1.0, 0.0), axis=0, keepdims=True
        )  # [1, K]
        new_keep = valid_col & (suppressed < 0.5)
        return new_keep, keep, it + 1

    init = (valid_col, jnp.zeros_like(valid_col), jnp.int32(0))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    out_ref[:] = keep.reshape(k, 1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("iou_thr",))
def pallas_nms_keep_mask(
    boxes: Array, valid: Array, iou_thr: float = 0.5
) -> Array:
    """Greedy-NMS keep mask for score-descending candidates (Pallas TPU).

    Args:
      boxes: [K, 4] XYXY, sorted by score descending.
      valid: [K] bool candidate mask.
      iou_thr: strict > suppression threshold (torchvision::nms semantics).

    Returns:
      [K] bool keep mask identical to sequential greedy NMS.
    """
    k0 = boxes.shape[0]
    k = _round_up(max(k0, 128), 128)
    boxes_p = jnp.zeros((k, 4), jnp.float32).at[:k0].set(boxes.astype(jnp.float32))
    valid_p = (
        jnp.zeros((k, 1), jnp.int32).at[:k0, 0].set(valid.astype(jnp.int32))
    )

    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thr=float(iou_thr), k=k),
        out_shape=jax.ShapeDtypeStruct((k, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(boxes_p, valid_p)
    return out[:k0, 0] > 0


def tpu_available() -> bool:
    """True when the default backend lowers Pallas TPU kernels."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
