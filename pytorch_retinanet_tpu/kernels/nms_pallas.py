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

Mosaic notes (why the kernel is shaped this way):
  * the fixpoint ``while_loop`` carries ONLY a scalar pair (iteration count,
    changed flag); the evolving keep vector lives in a VMEM scratch ref.
    Loop-carried large vectors (especially i1) fail Mosaic legalization.
  * each iteration computes ``suppressed = suppressᵀ · keep`` as a [K,K]x[K,1]
    MXU matvec (f32 0/1 masks) instead of boolean reductions.

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


def _nms_kernel(
    boxes_ref, valid_ref, out_ref, suppt_ref, keep_ref, *, iou_thr: float, k: int
):
    boxes = boxes_ref[:]  # [K, 4] f32
    valid = valid_ref[:].astype(jnp.float32)  # [K, 1] 0/1

    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    x2, y2 = boxes[:, 2:3], boxes[:, 3:4]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # [K, 1]

    # Pairwise IoU [K, K] on the VPU from rank-2 broadcasts.
    ix = jnp.maximum(jnp.minimum(x2, x2.T) - jnp.maximum(x1, x1.T), 0.0)
    iy = jnp.maximum(jnp.minimum(y2, y2.T) - jnp.maximum(y1, y1.T), 0.0)
    inter = ix * iy
    union = area + area.T - inter
    iou = inter / jnp.maximum(union, 1e-12)

    idx = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    jdx = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # suppt[j, i] = 1 if i (higher score) can suppress j — transposed so the
    # per-iteration matvec (suppt · keep) runs straight on the MXU.
    suppt_ref[:] = jnp.where(
        (iou > iou_thr) & (idx > jdx),  # rows j, cols i with i < j
        1.0,
        0.0,
    ) * valid * valid.T  # mask both endpoints; [K(j), K(i)]
    keep_ref[:] = valid

    def cond(state):
        it, changed = state
        return jnp.logical_and(changed > 0, it < k)

    def body(state):
        it, _ = state
        keep = keep_ref[:]  # [K, 1] f32
        suppressed = jax.lax.dot_general(
            suppt_ref[:],
            keep,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, 1]: #kept higher-score suppressors of j
        new_keep = valid * jnp.where(suppressed > 0.5, 0.0, 1.0)
        changed = jnp.sum(jnp.abs(new_keep - keep)) > 0.0
        keep_ref[:] = new_keep
        return it + 1, changed.astype(jnp.int32)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))
    out_ref[:] = (keep_ref[:] > 0.5).astype(jnp.int32)


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
        scratch_shapes=[
            pltpu.VMEM((k, k), jnp.float32),  # transposed suppression matrix
            pltpu.VMEM((k, 1), jnp.float32),  # evolving keep vector
        ],
    )(boxes_p, valid_p)
    return out[:k0, 0] > 0


def tpu_available() -> bool:
    """True when the default backend lowers Pallas TPU kernels."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
