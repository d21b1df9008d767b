"""Pallas TPU kernel: per-anchor top-2 classes in ONE pass over the logits.

The postprocess candidate selection (ops/nms.py, the approx path for large
pyramid levels) spends its time reading the [A_l, C] class logits: the
anchor class-max is one full read, and the stage-2 row gather re-reads the
selected anchors' rows with random-row DMA (~8.7 ms of the 13.5 ms
batch-32 selection, docs/ROOFLINE.md "Postprocess accounting"). XLA offers
no single-pass alternative: ``lax.top_k(x, 2)`` along the minor axis
lowers to a sort-like variadic reduction measured 6.5x SLOWER than the
two-stage scheme (88.8 vs 13.5 ms/batch32, round-3 experiment).

This kernel streams the logits tile-by-tile exactly once and emits, per
anchor, the top-2 class values and their indices — everything stage 2
needs. Selection then shrinks to: ``approx_max_k`` over the [A_l] anchor
maxima, four tiny [k] gathers, and an EXACT ``top_k`` over the 2k
(anchor, class) pairs — more faithful than the production approx-over-90k
it replaces, and the only pairs either scheme can drop are an anchor's
3rd+ classes (the deviation PARITY_REPORT.md measures at 0.0000 AP).

MEASURED NEGATIVE RESULT (round 3) — the kernel is compiled-correct on
the chip (bit-equal to :func:`top2_reference_xla` at all production level
shapes) but 7x SLOWER than the two-stage scheme it was meant to replace:
97.7 vs 13.8 ms/batch32 for the full selection. Cause: the [R, C=90]
input block's minor dim is not 128-aligned, so Mosaic loads it as
row-strided DMA into lane-padded VMEM tiles (180-byte rows into 256-byte
strides) instead of the flat contiguous stream XLA's minor-dim reduction
uses. Realigning requires either padding C to 128 (a full extra
read+write of the logits — defeats the point) or a modular-wrap
segmented reduction over flat [·, 128] tiles (class = offset % 90 — the
90/128 lane scramble makes per-anchor maxima a scatter Mosaic doesn't
have). With XLA's lax.top_k(x, 2) also measured 6.5x slower, the
two-stage select-gather-select in ops/nms.py stands as the best known
scheme; this kernel stays as tested groundwork and is NOT wired into any
production path. See docs/ROOFLINE.md "Postprocess accounting".

Per-anchor top-2 semantics (ties): index = lowest class id at the value,
second entry may equal the first value at a different class — identical to
``lax.top_k``'s tie order on the gathered rows.

Mosaic notes:
  * per-quantity outputs are [A, 1] blocks (lane dim 1 — legal, compact in
    HBM; the NMS kernel uses the same shape).
  * the [R, C] input block keeps the array's full minor dim (C=90): the
    row-major block is one contiguous DMA; Mosaic pads lanes in VMEM.
  * grids use clamped index maps (ceil(A/R) blocks): the last block
    re-reads/re-writes overlapping rows with identical values, so A need
    not divide by the tile — rows [:A] are always exact.

Reference: replaces the candidate selection of retinanet/models.py:193-219
(per-class score thresholding) in its fused TPU form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_NEG = -3.0e38  # f32 lowest-ish; beats any bf16 logit


def _top2_kernel(x_ref, v1_ref, c1_ref, v2_ref, c2_ref):
    x = x_ref[...].astype(jnp.float32)  # [R, C]
    r, c = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    big = jnp.int32(2**30)

    v1 = jnp.max(x, axis=1, keepdims=True)  # [R, 1]
    c1 = jnp.min(jnp.where(x == v1, lane, big), axis=1, keepdims=True)
    x2 = jnp.where(lane == c1, _NEG, x)
    v2 = jnp.max(x2, axis=1, keepdims=True)
    c2 = jnp.min(jnp.where(x2 == v2, lane, big), axis=1, keepdims=True)

    v1_ref[...] = v1
    c1_ref[...] = c1
    v2_ref[...] = v2
    c2_ref[...] = c2


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_top2_classes(
    logits: Array, *, interpret: bool = False
) -> tuple[Array, Array, Array, Array]:
    """Per-anchor top-2 classes of [A, C] logits in one streamed pass.

    Returns ``(v1, c1, v2, c2)``: [A] f32 top values and [A] int32 class
    indices, ``v1 >= v2``, ties broken toward the lower class id.
    Requires ``A >= 8`` (one sublane tile); C is arbitrary.
    """
    a, c = logits.shape
    r = min(1024, (a // 8) * 8)
    if r == 0:
        raise ValueError(f"pallas_top2_classes needs A >= 8, got {a}")
    grid = ((a + r - 1) // r,)

    def idx(i):
        return (i, 0)

    out_specs = [pl.BlockSpec((r, 1), idx) for _ in range(4)]
    v1, c1, v2, c2 = pl.pallas_call(
        _top2_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((r, c), idx)],
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((a, 1), jnp.float32),
            jax.ShapeDtypeStruct((a, 1), jnp.int32),
            jax.ShapeDtypeStruct((a, 1), jnp.float32),
            jax.ShapeDtypeStruct((a, 1), jnp.int32),
        ],
        interpret=interpret,
    )(logits)
    return v1[:, 0], c1[:, 0], v2[:, 0], c2[:, 0]


def top2_reference_xla(logits: Array) -> tuple[Array, Array, Array, Array]:
    """Pure-XLA equivalent of :func:`pallas_top2_classes` (cross-check and
    CPU path). Multiple passes over the logits — correct, not fast."""
    x = logits.astype(jnp.float32)
    a, c = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (a, c), 1)
    big = jnp.int32(2**30)
    v1 = jnp.max(x, axis=1)
    c1 = jnp.min(jnp.where(x == v1[:, None], lane, big), axis=1)
    x2 = jnp.where(lane == c1[:, None], _NEG, x)
    v2 = jnp.max(x2, axis=1)
    c2 = jnp.min(jnp.where(x2 == v2[:, None], lane, big), axis=1)
    return v1, c1, v2, c2
