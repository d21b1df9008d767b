"""Pallas TPU kernel: fused identity-residual bottleneck block.

One VMEM-resident pass computes a full ResNet bottleneck with identity
shortcut — 1x1 conv + BN + relu → 3x3 conv + BN + relu → 1x1 conv + BN →
add residual → relu — reading the block input from HBM once and writing the
block output once.

Why: the backbone roofline at batch 32 (docs/ROOFLINE_BACKBONE.md) shows
layer1-3 HBM-bound at 637-733 GB/s. XLA materializes the two thin mid-width
tensors and re-reads the wide input for the residual add, ~2.5x the
irreducible traffic; this kernel keeps every intermediate in VMEM, cutting
per-block traffic to (read input + write output). It applies to every
STRIDE-1 IDENTITY block (blocks 1..n of each stage — 7 of R50's 10
layer1-3 blocks); stage-entry blocks (stride / projection shortcut) stay on
XLA.

Formulation (channels in lanes):
  * The input is row-padded in HBM ([B, H+2, W, C]); each grid cell DMAs a
    halo tile of R+2 rows (double-buffered, same pattern as the stem
    kernel) and computes R output rows.
  * conv1 (1x1) is one GEMM over the flattened [(R+2)*W, C] tile — the two
    halo rows are computed too, exactly what conv2's 3x3 needs, so nothing
    is wasted.
  * conv2 (3x3) is im2col-as-values: zero width-pad y1, take the 9
    (dy, dx)-shifted [R, W, mid] slices, concatenate along channels →
    [R*W, 9*mid] @ [9*mid, mid]. Slices are assembled as VALUES, never
    routed through a shared scratch ref (stem-kernel lesson: Mosaic
    overlaps the next iteration's stores → write-after-read hazards).
  * conv3 (1x1) GEMM → f32 accumulator; folded-BN scale/bias applied in
    f32; the residual is re-read from the input tile's center rows (already
    in VMEM — the whole point).

Frozen-BN inference semantics (scale/bias folded from running stats), the
same contract as the fused stem; the custom VJP recomputes the backward
through the equivalent XLA composition so frozen-BN TRAINING can use the
kernel forward too.

Reference: replaces torchvision Bottleneck blocks (reference
backbone.py:83-136) on the TPU inference path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def fold_bn(params, stats, name: str, eps: float = 1e-5):
    """Frozen-BN fold: y = x*scale + bias with scale = gamma/sqrt(var+eps).

    The SINGLE definition shared by the kernel wrappers and the XLA trunk
    interpreter (models/fused_backbone.py) so the fold algebra cannot
    diverge between the kernel and its cross-check paths.
    """
    p = params[name]["BatchNorm_0"]
    s = stats[name]["BatchNorm_0"]
    scale = p["scale"] / jnp.sqrt(s["var"] + eps)
    return scale, p["bias"] - s["mean"] * scale


def _bottleneck_kernel(
    xp_hbm,   # [B, H+2, W, C] bf16 HBM (rows zero-padded by 1 top/bottom)
    w1_ref,   # [C, mid] bf16 VMEM
    w2_ref,   # [9*mid, mid] bf16 VMEM (tap-major, or dx-major when dy_concat)
    w3_ref,   # [mid, C] bf16 VMEM
    s1_ref, b1_ref,  # [1, mid] f32
    s2_ref, b2_ref,  # [1, mid] f32
    s3_ref, b3_ref,  # [1, C] f32
    out_ref,  # [1, R, W, C] bf16 VMEM block
    xtile,    # VMEM scratch [2, R+2, W, C] bf16 (double buffer)
    sem,      # DMA semaphores (2,)
    *,
    rows: int,
    width: int,   # 8-aligned (padded) width of the refs
    real_w: int,  # true image width; cols >= real_w are zero padding
    cin: int,
    mid: int,
    dy_concat: bool = False,   # conv2 as 3 K=3*mid GEMMs instead of 9 K=mid
    cout_chunk: int = 0,       # conv3/residual/write in C-chunks (VMEM cap)
):
    b = pl.program_id(0)
    q = pl.program_id(1)
    n_q = pl.num_programs(1)
    t_rows = rows + 2

    # Double-buffered halo DMA (grid cells run sequentially on one core;
    # scratch persists across cells, so each cell prefetches the next tile).
    idx = b * n_q + q
    slot = jax.lax.rem(idx, 2)
    next_slot = 1 - slot

    def _start(i, s):
        bb = jax.lax.div(i, n_q)
        qq = jax.lax.rem(i, n_q)
        pltpu.make_async_copy(
            xp_hbm.at[bb, pl.ds(rows * qq, t_rows)], xtile.at[s], sem.at[s]
        ).start()

    @pl.when(idx == 0)
    def _():
        _start(idx, slot)

    @pl.when(idx + 1 < pl.num_programs(0) * n_q)
    def _():
        _start(idx + 1, next_slot)

    pltpu.make_async_copy(
        xp_hbm.at[b, pl.ds(rows * q, t_rows)], xtile.at[slot], sem.at[slot]
    ).wait()

    x = xtile[slot]  # [R+2, W, C]

    # conv1: 1x1 over all R+2 rows (the halo rows feed conv2, zero waste)
    acc1 = jax.lax.dot_general(
        x.reshape(t_rows * width, cin),
        w1_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y1 = jnp.maximum(acc1 * s1_ref[:] + b1_ref[:], 0.0).astype(jnp.bfloat16)
    y1 = y1.reshape(t_rows, width, mid)
    if real_w != width:
        # Zero conv1's output on the width-padding columns: they are
        # relu(b1) (zero INPUT, nonzero bias), and the 3x3's right tap at
        # the last real column must read zero to match torch padding.
        col = jax.lax.broadcasted_iota(jnp.int32, (t_rows, width, mid), 1)
        y1 = jnp.where(col < real_w, y1, jnp.bfloat16(0))

    zcol = jnp.zeros((t_rows, 1, mid), jnp.bfloat16)
    y1p = jnp.concatenate([zcol, y1, zcol], axis=1)  # [R+2, W+2, mid]
    acc2 = jnp.zeros((rows * width, mid), jnp.float32)
    if dy_concat:
        # conv2 as THREE K=3*mid GEMMs (one per dx): for each dx, the three
        # dy-shifted row slices concat along channels — row-offset slices
        # need no relayout (rows are the outer dim), and the deeper K feeds
        # the MXU's 128-deep array instead of nine shallow K=mid passes.
        # w2_ref rows are dx-major here: [dx*(3*mid) + dy*mid + c, n].
        for dx in range(3):
            cdx = jnp.concatenate(
                [y1p[dy : dy + rows, dx : dx + width, :] for dy in range(3)],
                axis=-1,
            ).reshape(rows * width, 3 * mid)
            w_dx = w2_ref[dx * 3 * mid : (dx + 1) * 3 * mid, :]
            acc2 = acc2 + jax.lax.dot_general(
                cdx, w_dx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        # conv2: 3x3 as NINE accumulated [R*W, mid] x [mid, mid] GEMMs (one
        # per tap) instead of an im2col patches buffer — no [R*W, 9*mid]
        # concat (its lane relayouts were the per-cell hot spot) and ~3 MB
        # less VMEM, which buys a 2x bigger row tile.
        for dy in range(3):
            for dx in range(3):
                tap = y1p[dy : dy + rows, dx : dx + width, :].reshape(
                    rows * width, mid
                )
                w_tap = w2_ref[(3 * dy + dx) * mid : (3 * dy + dx + 1) * mid, :]
                acc2 = acc2 + jax.lax.dot_general(
                    tap, w_tap, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    y2 = jnp.maximum(acc2 * s2_ref[:] + b2_ref[:], 0.0).astype(jnp.bfloat16)

    # conv3 + BN + residual + relu, all in the f32 accumulator. cout_chunk
    # bounds the live f32 accumulator to [R*W, chunk] (instead of the full
    # [R*W, C]) so the row tile R can grow — the per-cell-overhead lever.
    chunk = cout_chunk or cin
    for j in range(cin // chunk):
        acc3 = jax.lax.dot_general(
            y2, w3_ref[:, j * chunk : (j + 1) * chunk],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y3 = acc3 * s3_ref[:, j * chunk : (j + 1) * chunk] + b3_ref[
            :, j * chunk : (j + 1) * chunk
        ]
        residual = (
            x[1 : rows + 1, :, j * chunk : (j + 1) * chunk]
            .reshape(rows * width, chunk)
            .astype(jnp.float32)
        )
        out = jnp.maximum(y3 + residual, 0.0).astype(jnp.bfloat16)
        out_ref[0, :, :, j * chunk : (j + 1) * chunk] = out.reshape(
            rows, width, chunk
        )


def _pick_rows(
    h: int,
    width: int,
    cin: int,
    mid: int,
    cout_chunk: int = 0,
    budget: int = 10 * 2**20,
    max_rows: int = 16,
) -> int:
    """Largest row-tile with H % R == 0 whose working set fits VMEM."""
    acc3_c = cout_chunk or cin
    best = 1
    for r in range(1, min(h, max_rows) + 1):
        if h % r:
            continue
        need = (
            2 * (r + 2) * width * cin * 2          # double-buffered input
            + (r + 2) * width * mid * 2            # y1
            + r * width * mid * 4                  # conv2 f32 accumulator
            + r * width * acc3_c * 4               # conv3 f32 accumulator
            + r * width * cin * 2                  # output block
        )
        if need <= budget:
            best = r
    return best


def _fused_bottleneck_impl(
    x: Array,
    w1: Array, s1: Array, b1: Array,
    w2: Array, s2: Array, b2: Array,
    w3: Array, s3: Array, b3: Array,
    interpret: bool,
    *,
    dy_concat: bool = False,
    cout_chunk: int = 0,
    vmem_budget: int = 10 * 2**20,
    max_rows: int = 16,
) -> Array:
    b, h, w, c = x.shape
    mid = w1.shape[-1]
    w8 = -(-w // 8) * 8  # Mosaic: sliced second-minor dims must tile by 8
    rows = _pick_rows(h, w8, c, mid, cout_chunk, vmem_budget, max_rows)
    xp = jnp.pad(
        x.astype(jnp.bfloat16), ((0, 0), (1, 1), (0, w8 - w), (0, 0))
    )
    if dy_concat:
        # [3, 3, mid, mid] HWIO → dx-major GEMM form: row (dx, dy, c) → n
        w2g = (
            w2.astype(jnp.bfloat16)
            .transpose(1, 0, 2, 3)
            .reshape(9 * mid, mid)
        )
    else:
        # [3, 3, mid, mid] HWIO → tap-major GEMM form [9*mid, mid]
        w2g = w2.astype(jnp.bfloat16).reshape(9 * mid, mid)

    kernel = functools.partial(
        _bottleneck_kernel, rows=rows, width=w8, real_w=w, cin=c, mid=mid,
        dy_concat=dy_concat, cout_chunk=cout_chunk,
    )
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda bb, qq: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    w1g = w1.astype(jnp.bfloat16).reshape(c, mid)
    w3g = w3.astype(jnp.bfloat16).reshape(mid, c)
    vecs = [
        s1.astype(jnp.float32).reshape(1, mid),
        b1.astype(jnp.float32).reshape(1, mid),
        s2.astype(jnp.float32).reshape(1, mid),
        b2.astype(jnp.float32).reshape(1, mid),
        s3.astype(jnp.float32).reshape(1, c),
        b3.astype(jnp.float32).reshape(1, c),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(b, h // rows),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [const(w1g), const(w2g), const(w3g)]
        + [const(v) for v in vecs],
        out_specs=pl.BlockSpec(
            (1, rows, w8, c), lambda bb, qq: (bb, qq, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w8, c), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, w8, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w1g, w2g, w3g, *vecs)
    return out[:, :, :w, :] if w8 != w else out


def bottleneck_reference_xla(
    x: Array,
    w1: Array, s1: Array, b1: Array,
    w2: Array, s2: Array, b2: Array,
    w3: Array, s3: Array, b3: Array,
) -> Array:
    """The exact XLA composition the kernel fuses (also the VJP recompute
    path): 1x1+BN+relu → 3x3(p1)+BN+relu → 1x1+BN → +identity → relu.
    Weights HWIO ([1,1,C,mid] / [3,3,mid,mid] / [1,1,mid,C]); bf16 compute,
    f32 scale/bias epilogues — matching models/layers.py conv+BatchNorm."""
    def conv(inp, k, pad):
        dn = jax.lax.conv_dimension_numbers(
            inp.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            inp.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
            [(pad, pad)] * 2, dimension_numbers=dn,
        ).astype(jnp.float32)

    y = jnp.maximum(conv(x, w1.reshape(1, 1, *w1.shape[-2:]), 0) * s1 + b1, 0.0)
    y = jnp.maximum(conv(y.astype(jnp.bfloat16), w2, 1) * s2 + b2, 0.0)
    y = conv(y.astype(jnp.bfloat16), w3.reshape(1, 1, *w3.shape[-2:]), 0) * s3 + b3
    return jnp.maximum(y + x.astype(jnp.float32), 0.0).astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _fused_bottleneck(x, w1, s1, b1, w2, s2, b2, w3, s3, b3, interpret):
    return _fused_bottleneck_impl(x, w1, s1, b1, w2, s2, b2, w3, s3, b3, interpret)


def _fused_bottleneck_fwd(x, w1, s1, b1, w2, s2, b2, w3, s3, b3, interpret):
    out = _fused_bottleneck_impl(x, w1, s1, b1, w2, s2, b2, w3, s3, b3, interpret)
    return out, (x, w1, s1, b1, w2, s2, b2, w3, s3, b3)


def _fused_bottleneck_bwd(interpret, res, g):
    _, vjp = jax.vjp(bottleneck_reference_xla, *res)
    return vjp(g)


_fused_bottleneck.defvjp(_fused_bottleneck_fwd, _fused_bottleneck_bwd)


def fused_bottleneck_supported(x_shape: Tuple[int, ...], mid: int) -> bool:
    """Static applicability: NHWC, identity-shortcut width (C == 4*mid),
    channel counts that tile lanes (mid >= 64), and a row tile that fits."""
    if len(x_shape) != 4:
        return False
    _, h, w, c = x_shape
    # mid >= 128: full-lane GEMMs. mid=64 (layer1) measured SLOWER than the
    # XLA composition end-to-end — half-lane MXU ops + small cells; layer1
    # stays on XLA until the kernel earns it.
    if c != 4 * mid or mid < 128 or c % 128 != 0:
        return False
    return _pick_rows(h, w, c, mid) >= 2


def fused_bottleneck(
    block_params, block_stats, x: Array, *, eps: float = 1e-5,
    interpret: bool = False,
) -> Array:
    """Fused identity bottleneck from a flax block param/stat subtree
    (``layer{s}_block{i}`` with conv1/2/3 + bn1/2/3, models/backbone.py)."""
    def fold(bn_name):
        return fold_bn(block_params, block_stats, bn_name, eps)

    s1, b1 = fold("bn1")
    s2, b2 = fold("bn2")
    s3, b3 = fold("bn3")
    return _fused_bottleneck(
        x,
        block_params["conv1"]["kernel"], s1, b1,
        block_params["conv2"]["kernel"], s2, b2,
        block_params["conv3"]["kernel"], s3, b3,
        interpret,
    )
