"""Pallas TPU kernel: fused ResNet stem (7x7-s2 conv + frozen BN + ReLU +
3x3-s2 maxpool) in ONE pass over the image.

Why this kernel exists (tools/profile_backbone.py, v5e, bs16 @ 800x1344):
XLA runs the stem region at 147 GB/s / 8 TFLOP/s — ~11 ms for conv+BN+pool,
vs a ~2 ms roofline. The 3-input-channel 7x7 conv defeats XLA's conv tiling
(space-to-depth was measured neutral, an explicit im2col+GEMM at the XLA
level measured WORSE at 16.4 ms, and reduce_window maxpool alone is 4.1 ms).
The fix is layout, not algebra: present the MXU one clean GEMM per conv row
and keep every intermediate in VMEM until the pooled output.

Formulation (width packed in QUADS)
-----------------------------------
Work in packed 4-pixel units along width. The input viewed as
``[B, H, W/4, 12]`` (lane l = 3*p + c of an NHWC row maps to (u, t) with
u = p // 4, t = 3*(p % 4) + c — a FREE reshape of the HBM array) is
transposed to ``xt [B, H, 12, W/4]`` (one XLA transpose, the only prep) and
zero-padded to 16 t-slots for DMA tiling. A conv tap at width kx then
becomes a LANE SHIFT m' plus a sublane pick:

  even outputs j = 2u: pixel 4u + (kx-3) → m' = floor((kx-3)/4) in {-1, 0}
  odd  outputs j = 2u+1: pixel 4u + (kx-1) → m' in {-1, 0, 1}

so per conv row the im2col patches are THREE lane-shifted tile copies sliced
at CONSECUTIVE sublanes (112 per (m', row) block), and TWO MXU GEMMs
(``We [64, 224]``, ``Wo [64, 336]``) yield the conv row's even and odd width
positions as separate ``[64, W/4]`` registers. That parity split is the
point: the 3-wide stride-2 maxpool at pooled column u consumes conv columns
{2u-1, 2u, 2u+1} = {odd[u-1], even[u], odd[u]} — one lane shift + max, NO
deinterleave (a v1 kernel that picked even sublanes post-hoc spent 6 ms in
relayouts doing that). Frozen-BN scale/bias + ReLU fuse into the f32
accumulator; rows pool in pairs; one cheap [64, W/4] transpose lands each
NHWC output row.

The maxpool's -inf padding is replaced by 0-padding, which is exact because
the pool consumes ReLU outputs (all >= 0). Conv row -1 (consumed by pool
row 0 with pad=1) is zeroed explicitly rather than computed.

Mosaic constraints encoded here (each cost a debugging round on v5e):
  * dynamic_rotate (pltpu.roll) is unreliable across lane widths — lane
    shifts are zero-pad + STATIC slices instead;
  * DMA slices need an 8-aligned second-minor dim and a 128-aligned minor
    dim — hence t 12→16 and W/4 → multiple of 128;
  * vectors sliced from different lazy lane offsets cannot be concatenated —
    the shifted copies are materialized through VMEM scratch first;
  * routing the per-row patch through ONE shared scratch ref creates a
    write-after-read hazard with the in-flight dot (Mosaic overlaps the next
    iteration's stores) — patches are assembled as values.

Reference: this replaces torchvision ResNet's conv1/bn1/relu/maxpool
(reference backbone.py:180-189) for inference on TPU; training keeps the
XLA composition via the custom-VJP backward.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# Pool rows computed per grid cell; bigger cells amortize per-cell DMA +
# kernel-launch overhead and the whole-tile lane-shift copies.
# Env-overridable for tuning/debugging.
_POOL_ROWS = int(_os.environ.get("STEM_POOL_ROWS", "8"))


def _stem_kernel(
    xt_hbm,  # [B, H+8, 16, W4] bf16 HBM (12 real t-slots zero-padded to 16)
    we_ref,  # [64, 224] bf16 VMEM: even-column GEMM weights
    wo_ref,  # [64, 336] bf16 VMEM: odd-column GEMM weights
    sc_ref,  # [64, 1] f32 VMEM: folded BN scale
    bi_ref,  # [64, 1] f32 VMEM: folded BN bias
    out_ref,  # [1, POOL_ROWS, W4, 64] bf16 VMEM block
    xtile,  # VMEM scratch [2, 4*pool_rows+7, 16, W4] bf16 (double buffer)
    rsh_ref,  # VMEM scratch [3, (4*pool_rows+7)*16, W4] bf16: shifted copies
    sem,  # DMA semaphores, one per buffer slot
    *,
    w4: int,
    pool_rows: int,
    interpret: bool,
):
    b = pl.program_id(0)
    q = pl.program_id(1)  # cell index along pooled height
    n_q = pl.num_programs(1)
    t_rows = 4 * pool_rows + 7  # padded input rows feeding this cell

    # Double-buffered halo DMA: grid cells run sequentially on one core and
    # scratch persists across them, so each cell prefetches the NEXT cell's
    # tile while it computes (guide pattern; hides the per-cell DMA latency).
    idx = b * n_q + q
    slot = jax.lax.rem(idx, 2)
    next_slot = 1 - slot

    def _start(i, s):
        bb = jax.lax.div(i, n_q)
        qq = jax.lax.rem(i, n_q)
        pltpu.make_async_copy(
            xt_hbm.at[bb, pl.ds(4 * pool_rows * qq, t_rows)],
            xtile.at[s],
            sem.at[s],
        ).start()

    @pl.when(idx == 0)
    def _():
        _start(idx, slot)

    @pl.when(idx + 1 < pl.num_programs(0) * n_q)
    def _():
        _start(idx + 1, next_slot)

    pltpu.make_async_copy(
        xt_hbm.at[b, pl.ds(4 * pool_rows * q, t_rows)], xtile.at[slot], sem.at[slot]
    ).wait()

    n_conv = 2 * pool_rows + 1  # conv rows feeding this cell (pad=1 pool)
    x = xtile[slot].reshape(t_rows * 16, w4)

    # Lane shifts as zero-pad + STATIC slices; the zeros double as the
    # conv's width padding. Stored to scratch to canonicalize lane offsets.
    zc = jnp.zeros((t_rows * 16, 1), jnp.bfloat16)
    xp = jnp.concatenate([zc, x, zc], axis=1)  # [., w4+2], lane = u+1
    for k in range(3):  # k = m' + 1, m' in {-1, 0, 1}
        rsh_ref[k] = xp[:, k : k + w4]  # rsh[k][:, u] = x[:, u + m']

    we = we_ref[:]
    wo = wo_ref[:]
    scale = sc_ref[:]  # [64, 1]
    bias = bi_ref[:]

    # Conv rows for this cell: global i = 2*pool_rows*q - 1 + il. Conv row i
    # reads padded input rows 2i+2 .. 2i+8 → tile rows 2il .. 2il+6 → X
    # sublanes [32*il, 32*il + 112) per shifted copy (16 slots/row).
    ys_e, ys_o = [], []
    for il in range(n_conv):
        sl = slice(32 * il, 32 * il + 112)
        # Patches as VALUES (not via a shared scratch ref — see module doc).
        p_e = jnp.concatenate([rsh_ref[0, sl], rsh_ref[1, sl]], axis=0)
        p_o = jnp.concatenate(
            [rsh_ref[0, sl], rsh_ref[1, sl], rsh_ref[2, sl]], axis=0
        )
        acc_e = jax.lax.dot_general(
            we, p_e, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [64, w4]
        acc_o = jax.lax.dot_general(
            wo, p_o, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        y_e = jnp.maximum(acc_e * scale + bias, 0.0).astype(jnp.bfloat16)
        y_o = jnp.maximum(acc_o * scale + bias, 0.0).astype(jnp.bfloat16)
        if il == 0:
            # global conv row -1 exists only as pool padding — force 0.
            y_e = jnp.where(q > 0, y_e, jnp.bfloat16(0))
            y_o = jnp.where(q > 0, y_o, jnp.bfloat16(0))
        ys_e.append(y_e)
        ys_o.append(y_o)

    zl = jnp.zeros((64, 1), jnp.bfloat16)
    for pp in range(pool_rows):
        rm_e = jnp.maximum(
            jnp.maximum(ys_e[2 * pp], ys_e[2 * pp + 1]), ys_e[2 * pp + 2]
        )
        rm_o = jnp.maximum(
            jnp.maximum(ys_o[2 * pp], ys_o[2 * pp + 1]), ys_o[2 * pp + 2]
        )
        # pooled column u = max(odd[u-1], even[u], odd[u]); odd[-1] is pad(0)
        o_prev = jnp.concatenate([zl, rm_o[:, :-1]], axis=1)
        wm = jnp.maximum(jnp.maximum(o_prev, rm_e), rm_o)  # [64, w4]
        out_ref[0, pp] = wm.T  # [w4, 64] — NHWC row

def _pack_weights(w7: Array) -> Tuple[Array, Array]:
    """[7, 7, 3, 64] stem kernel → (We [64, 224], Wo [64, 336]) GEMM forms.

    Row ((m'+1) * 112 + dy * 16 + 3*d + c) holds w7[dy, kx, c] where
    kx = 4*m' + d + 3 (even outputs) or 4*m' + d + 1 (odd outputs), zeroed
    when kx falls outside the 7-tap kernel; t-slots 12..15 are the DMA
    alignment padding."""
    w7 = w7.astype(jnp.float32)

    def pack(offset, n_shifts, first_shift):
        wg = jnp.zeros((n_shifts, 7, 16, 64), jnp.float32)
        for k, mp in enumerate(range(first_shift, first_shift + n_shifts)):
            for d in range(4):
                kx = 4 * mp + d + offset
                if 0 <= kx <= 6:
                    wg = wg.at[k, :, 3 * d : 3 * d + 3, :].set(w7[:, kx, :, :])
        return wg.reshape(n_shifts * 112, 64).T.astype(jnp.bfloat16)

    return pack(3, 2, -1), pack(1, 3, -1)


def stem_reference_xla(
    images: Array, w7: Array, scale: Array, bias: Array
) -> Array:
    """The exact XLA composition the kernel fuses (also the VJP recompute
    path): 7x7-s2 conv (torch padding 3) → y*scale+bias → relu → 3x3-s2
    maxpool (torch padding 1). NHWC in/out, bf16 like the flax stem."""
    x = images.astype(jnp.bfloat16)
    k = w7.astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    # bf16 in/out (XLA accumulates conv in f32 internally) — keeping one
    # dtype end-to-end also keeps the transposed convs in the VJP legal.
    y = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn
    ).astype(jnp.float32)
    y = jnp.maximum(y * scale.astype(jnp.float32) + bias.astype(jnp.float32), 0.0)
    y = y.astype(jnp.bfloat16)
    # init must be the -inf PYTHON scalar: a traced/array init demotes this to
    # the generic reduce_window, which has no reverse-mode autodiff rule (the
    # custom-VJP train path differentiates through this function).
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _fused_stem_impl(
    images: Array, w7: Array, scale: Array, bias: Array, interpret: bool
) -> Array:
    b, h, w, c = images.shape
    assert c == 3 and h % 4 == 0 and w % 4 == 0, images.shape
    w4 = w // 4
    # Mosaic DMA slices need a 128-aligned minor dim: pad the packed-quad
    # width. Pad lanes are zero input → their conv/pool columns are garbage
    # (relu(bias)) and are sliced off; column w4 - 1 only reads real lanes.
    w4p = -(-w4 // 128) * 128
    # free reshape + one transpose: lanes become packed-quad index u
    xt = images.astype(jnp.bfloat16).reshape(b, h, w4, 12).transpose(0, 1, 3, 2)
    # conv pad 3 + pool-pad rows; t pads 12→16 for DMA tiling
    xt = jnp.pad(xt, ((0, 0), (5, 3), (0, 4), (0, w4p - w4)))
    we, wo = _pack_weights(w7)
    sc = scale.astype(jnp.float32).reshape(64, 1)
    bi = bias.astype(jnp.float32).reshape(64, 1)

    pool_rows = _POOL_ROWS
    while h % (4 * pool_rows) != 0:  # small buckets: shrink the cell
        pool_rows //= 2
    t_rows = 4 * pool_rows + 7
    grid = (b, h // (4 * pool_rows))
    kernel = functools.partial(
        _stem_kernel, w4=w4p, pool_rows=pool_rows, interpret=interpret
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # manual halo DMA
            pl.BlockSpec((64, 224), lambda bb, qq: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 336), lambda bb, qq: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda bb, qq: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda bb, qq: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, pool_rows, w4p, 64), lambda bb, qq: (bb, qq, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h // 4, w4p, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, t_rows, 16, w4p), jnp.bfloat16),
            pltpu.VMEM((3, t_rows * 16, w4p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, we, wo, sc, bi)
    return out[:, :, :w4, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_stem(images, w7, scale, bias, interpret):
    return _fused_stem_impl(images, w7, scale, bias, interpret)


def _fused_stem_fwd(images, w7, scale, bias, interpret):
    return _fused_stem_impl(images, w7, scale, bias, interpret), (
        images, w7, scale, bias,
    )


def _fused_stem_bwd(interpret, res, g):
    # Rare path (the stem is fused on inference only): recompute through the
    # equivalent XLA composition and take its VJP.
    images, w7, scale, bias = res
    _, vjp = jax.vjp(stem_reference_xla, images, w7, scale, bias)
    return vjp(g)


_fused_stem.defvjp(_fused_stem_fwd, _fused_stem_bwd)


def fused_stem_supported(image_shape: Tuple[int, ...]) -> bool:
    """Static applicability check for :func:`fused_stem`."""
    if len(image_shape) != 4:
        return False
    _, h, w, c = image_shape
    return c == 3 and h % 32 == 0 and w % 4 == 0


def fused_stem(
    variables,
    images: Array,
    *,
    mean=None,
    std=None,
    eps: float = 1e-5,
    interpret: bool = False,
) -> Array:
    """Fused stem from a RetinaNet/backbone variables pytree.

    Normalizes ``images`` exactly like ``RetinaNetModule.__call__``
    ((x - mean) / std in f32; pass ``mean``/``std`` of the module, defaults
    to the ImageNet constants), reads the stem conv kernel and the
    running-statistics stem-BN parameters from ``variables`` (the
    converter's layout: ``params[.backbone].stem_conv`` /
    ``stem_bn.BatchNorm_0`` + matching ``batch_stats``), folds BN into a
    per-channel scale/bias, and returns the pooled stem output that
    ``ResNetBackbone.__call__`` / ``RetinaNetModule.__call__`` accept as
    ``stem_in``.

    Inference-path semantics (running BN statistics) — callers gate on that.
    """
    from ..config import MEAN, STD

    mean = jnp.asarray(MEAN if mean is None else mean, jnp.float32)
    std = jnp.asarray(STD if std is None else std, jnp.float32)
    # uint8 callers pass pre-folded mean*255/std*255 (apply_detector:190-195)
    # — no dtype branch here, or the fold would apply twice.
    x = (images.astype(jnp.float32) - mean) / std

    params = variables["params"]
    stats = variables["batch_stats"]
    if "backbone" in params:
        params = params["backbone"]
        stats = stats["backbone"]
    w7 = params["stem_conv"]["kernel"]
    bn_p = params["stem_bn"]["BatchNorm_0"]
    bn_s = stats["stem_bn"]["BatchNorm_0"]
    scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    bias = bn_p["bias"] - bn_s["mean"] * scale
    return _fused_stem(x, w7, scale, bias, interpret)
