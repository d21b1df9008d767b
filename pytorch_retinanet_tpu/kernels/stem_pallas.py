"""Pallas TPU kernel: fused ResNet stem (7x7-s2 conv + frozen BN + ReLU +
3x3-s2 maxpool) in ONE pass over the image.

Why this kernel exists (tools/profile_backbone.py, v5e, bs16 @ 800x1344):
XLA runs the stem region at 147 GB/s / 8 TFLOP/s — ~11 ms for conv+BN+pool,
vs a ~2 ms roofline. The 3-input-channel 7x7 conv defeats XLA's conv tiling
(space-to-depth was measured neutral, an explicit im2col+GEMM at the XLA
level measured WORSE at 16.4 ms, and reduce_window maxpool alone is 4.1 ms).
The fix is layout, not algebra: present the MXU one clean GEMM per conv row
and keep every intermediate in VMEM until the pooled output.

Formulation
-----------
Work in "packed pixel pair" units along width. With the input viewed as
``[B, H, W/2, 6]`` (lane l = 3*p + c of an NHWC row maps to (j, t) with
j = p // 2, t = 3*(p % 2) + c — a FREE reshape of the HBM array) and then
transposed to ``xt [B, H, 6, W/2]`` (one XLA transpose, the only prep), a
conv tap at pixel offset d = 3*kx - 9 + c becomes a LANE SHIFT by
m = floor(d / 6) plus a sublane pick t = d - 6m:

    patch[(m, dy, t), j] = xt[2i + dy - 3, t, j + m],   m in {-2, -1, 0, 1}

So per conv output row i the whole im2col patch ``P [224, W/2]`` is FOUR
lane-shifted copies of the input tile, each contributing 56 CONSECUTIVE
sublanes — no gathers, no strided access. One MXU GEMM ``Wg [64, 224] x P``
then yields the conv row transposed ``[64, W/2]``; frozen-BN scale/bias +
ReLU fuse into the f32 accumulator, rows pool in pairs-of-rows, the width
pool is two sublane shifts + max on the transposed result, and an
even-sublane pick lands the NHWC ``[W/4, 64]`` output row.

The maxpool's -inf padding is replaced by 0-padding, which is exact because
the pool consumes ReLU outputs (all >= 0). Conv row -1 (consumed by pool
row 0 with pad=1) is zeroed explicitly rather than computed.

Reference: this replaces torchvision ResNet's conv1/bn1/relu/maxpool
(reference backbone.py:180-189) for inference on TPU; training keeps the
XLA composition via the custom-VJP backward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# Pool rows computed per grid cell. 8 pool rows = 17 conv rows = 39 padded
# input rows; bigger cells amortize the per-cell DMA latency and the 4
# whole-tile lane-shift copies. Env-overridable for tuning/debugging.
import os as _os

_POOL_ROWS = int(_os.environ.get("STEM_POOL_ROWS", "8"))


def _stem_kernel(
    xt_hbm,  # [B, H+8, 8, W2] bf16, HBM (manual DMA — windows overlap;
    #          the per-pixel-pair dim is 6 real slots zero-padded to 8
    #          for DMA tiling alignment)
    wg_ref,  # [64, 224] bf16 VMEM: GEMM-form stem kernel (see _pack_weights)
    sc_ref,  # [64, 1] f32 VMEM: folded BN scale
    bi_ref,  # [64, 1] f32 VMEM: folded BN bias
    out_ref,  # [1, POOL_ROWS, W2//2, 64] bf16 VMEM block
    xtile,  # VMEM scratch [4*pool_rows+7, 8, W2] bf16
    rsh_ref,  # VMEM scratch [4, (4*pool_rows+7)*8, W2] bf16: lane-shifted copies
    sem,  # DMA semaphore
    *,
    w2: int,
    pool_rows: int,
    interpret: bool,
):
    b = pl.program_id(0)
    q = pl.program_id(1)  # cell index along pooled height
    t_rows = 4 * pool_rows + 7  # padded input rows feeding this cell

    dma = pltpu.make_async_copy(
        xt_hbm.at[b, pl.ds(4 * pool_rows * q, t_rows)], xtile, sem
    )
    dma.start()
    dma.wait()

    n_conv = 2 * pool_rows + 1  # conv rows feeding this cell (pad=1 pool)
    x = xtile[:].reshape(t_rows * 8, w2)

    # Lane shifts as zero-pad + STATIC slices (Mosaic's dynamic_rotate is not
    # reliable across lane widths; static offset slices lower to plain lane
    # shifts, and the concatenated zeros double as the conv's width padding).
    # Each shifted copy is STORED to scratch: the store canonicalizes the
    # lazy layout offsets, without which the later patch assembly would mix
    # vectors with different lane offsets (a Mosaic concat limitation).
    zc = jnp.zeros((t_rows * 8, 2), jnp.bfloat16)
    xp = jnp.concatenate([zc, x, zc[:, :1]], axis=1)  # [312, w2+3], lane = j+2
    for k in range(4):  # k = m + 2, m in {-2, -1, 0, 1}
        rsh_ref[k] = xp[:, k : k + w2]  # rsh[k][:, j] = x[:, j + m] (0-padded)

    wg = wg_ref[:]
    scale = sc_ref[:]  # [64, 1]
    bias = bi_ref[:]

    # Conv rows for this cell: global i = 2*pool_rows*q - 1 + il.
    # Conv row i reads padded input rows 2i+2 .. 2i+8 → tile rows 2il .. 2il+6
    # → X sublanes [16*il, 16*il + 56) per lane-shift copy (8 slots/row).
    ys = []
    for il in range(n_conv):
        # Assemble the patch as a VALUE from the canonical scratch copies —
        # routing it through one shared scratch ref instead creates a
        # write-after-read hazard: Mosaic overlaps the next iteration's
        # stores with the in-flight dot's operand read (observed as a
        # scheduling-dependent subset of corrupted conv rows on v5e).
        p_mat = jnp.concatenate(
            [rsh_ref[k, 16 * il : 16 * il + 56] for k in range(4)], axis=0
        )  # [224, w2]
        acc = jax.lax.dot_general(
            wg,
            p_mat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [64, w2]
        y = jnp.maximum(acc * scale + bias, 0.0).astype(jnp.bfloat16)
        if il == 0:
            # global conv row -1 exists only as pool padding — force 0.
            y = jnp.where(q > 0, y, jnp.bfloat16(0))
        ys.append(y)

    zrow = jnp.zeros((1, 64), jnp.bfloat16)
    for pp in range(pool_rows):
        rm = jnp.maximum(jnp.maximum(ys[2 * pp], ys[2 * pp + 1]), ys[2 * pp + 2])
        rt = rm.T  # [w2, 64] — width now in sublanes
        up = jnp.concatenate([zrow, rt[:-1]], axis=0)  # row j-1 (0-padded)
        dn = jnp.concatenate([rt[1:], zrow], axis=0)  # row j+1 (0-padded)
        wm = jnp.maximum(jnp.maximum(up, rt), dn)
        # pooled width u keeps rows 2u (Mosaic rejects strided slices —
        # split the sublane dim and take the even half instead)
        sel = wm.reshape(w2 // 2, 2, 64)[:, 0, :]  # [w2//2, 64]
        out_ref[0, pp] = sel


def _pack_weights(w7: Array) -> Array:
    """[7, 7, 3, 64] stem kernel → [64, 224] GEMM form.

    Row (m_idx * 56 + dy * 8 + t) holds w7[dy, kx, c] with t = 3*s + c
    (t in [0, 6); slots 6-7 are the DMA-alignment zero padding) and
    kx = 2*m + 3 + s (zero where kx falls outside the 7-tap kernel)."""
    w7 = w7.astype(jnp.float32)
    wg = jnp.zeros((4, 7, 8, 64), jnp.float32)
    for m_idx, m in enumerate((-2, -1, 0, 1)):
        for s in (0, 1):
            kx = 2 * m + 3 + s
            if 0 <= kx <= 6:
                wg = wg.at[m_idx, :, 3 * s : 3 * s + 3, :].set(w7[:, kx, :, :])
    return wg.reshape(224, 64).T.astype(jnp.bfloat16)  # [64, 224]


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
    init = jnp.asarray(-jnp.inf, y.dtype)
    return jax.lax.reduce_window(
        y, init, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _fused_stem_impl(
    images: Array, w7: Array, scale: Array, bias: Array, interpret: bool
) -> Array:
    b, h, w, c = images.shape
    assert c == 3 and h % 4 == 0 and w % 4 == 0, images.shape
    w2 = w // 2
    # Mosaic DMA slices need a 128-aligned minor dim: pad the packed-pair
    # width. The pad lanes are zero input → their conv/pool columns are
    # garbage (relu(bias)) and are sliced off the output; column w2//2 - 1
    # only reads real lanes, so the result is unaffected.
    w2p = -(-w2 // 128) * 128
    # free reshape + one transpose: lanes become packed-pair index j
    xt = images.astype(jnp.bfloat16).reshape(b, h, w2, 6).transpose(0, 1, 3, 2)
    # conv pad 3 + pool-pad rows; the t dim pads 6→8 for DMA tiling
    xt = jnp.pad(xt, ((0, 0), (5, 3), (0, 2), (0, w2p - w2)))
    wg = _pack_weights(w7)
    sc = scale.astype(jnp.float32).reshape(64, 1)
    bi = bias.astype(jnp.float32).reshape(64, 1)

    pool_rows = _POOL_ROWS
    while h % (4 * pool_rows) != 0:  # small buckets: shrink the cell
        pool_rows //= 2
    t_rows = 4 * pool_rows + 7
    grid = (b, h // (4 * pool_rows))
    kernel = functools.partial(
        _stem_kernel, w2=w2p, pool_rows=pool_rows, interpret=interpret
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # manual halo DMA
            pl.BlockSpec((64, 224), lambda bb, qq: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda bb, qq: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda bb, qq: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, pool_rows, w2p // 2, 64), lambda bb, qq: (bb, qq, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h // 4, w2p // 2, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((t_rows, 8, w2p), jnp.bfloat16),
            pltpu.VMEM((4, t_rows * 8, w2p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, wg, sc, bi)
    return out[:, :, : w2 // 2, :]


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
