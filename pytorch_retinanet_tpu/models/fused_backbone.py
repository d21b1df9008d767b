"""Kernel-fused inference path for the ResNet trunk.

Functionally identical to ``ResNetBackbone.__call__`` with frozen-BN
inference semantics (running statistics; the default ``freeze_bn`` config),
assembled OUTSIDE flax directly from the variables pytree so the hot blocks
can route through Pallas kernels:

* stem → :func:`..kernels.fused_stem` (conv7x7s2 + BN + relu + maxpool in one
  VMEM pass);
* every stride-1 identity bottleneck (blocks 1..n of each stage) →
  :func:`..kernels.fused_bottleneck` (1x1→3x3→1x1 + BN + residual + relu in
  one VMEM pass — the trunk is HBM-bound, docs/ROOFLINE_BACKBONE.md);
* stage-entry blocks (stride-2 and/or projection shortcut) stay on the XLA
  composition below, numerically matching models/backbone.py's modules
  (same eps, bf16 compute, f32 scale/bias epilogues).

The flax module remains the source of truth for init/training/state; this is
the inference interpreter over the SAME param tree (the converter's layout,
models/converter.py), used by ``models.retinanet.apply_detector`` when the
fused path is applicable. Parity with the module path is tested in
tests/test_fused_backbone.py (CPU/interpret) and on the real chip by
tools/tpu_selfcheck.py.

Reference: the trunk this reproduces is backbone.py:139-263 (C3/C4/C5 out).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ..kernels.bottleneck_pallas import (
    fold_bn as _fold_bn,
    fused_bottleneck,
    fused_bottleneck_supported,
)
from .backbone import RESNET_SPECS

Array = jnp.ndarray


def _conv(x: Array, kernel: Array, strides: int, pad: int) -> Array:
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        kernel.astype(jnp.bfloat16),
        (strides, strides),
        [(pad, pad)] * 2,
        dimension_numbers=dn,
    )


def _xla_bottleneck(bp: Dict, bs: Dict, x: Array, strides: int) -> Array:
    """Stage-entry bottleneck (stride and/or projection) — XLA composition
    matching models/backbone.py Bottleneck (V1.5: stride on the 3x3)."""
    def bn(name, y):
        scale, bias = _fold_bn(bp, bs, name)
        return (y.astype(jnp.float32) * scale + bias).astype(jnp.bfloat16)

    y = jax.nn.relu(bn("bn1", _conv(x, bp["conv1"]["kernel"], 1, 0)))
    y = jax.nn.relu(bn("bn2", _conv(y, bp["conv2"]["kernel"], strides, 1)))
    y = bn("bn3", _conv(y, bp["conv3"]["kernel"], 1, 0))
    if "downsample_conv" in bp:
        residual = bn(
            "downsample_bn", _conv(x, bp["downsample_conv"]["kernel"], strides, 0)
        )
    else:
        residual = x.astype(jnp.bfloat16)
    return jax.nn.relu(y + residual)


def fused_trunk_applicable(kind: str) -> bool:
    """The fused trunk covers bottleneck architectures (identity blocks wide
    enough for the kernel's lane tiling); basic-block nets use the module."""
    block_kind, _ = RESNET_SPECS[kind]
    return block_kind == "bottleneck"


def apply_trunk_fused(
    variables,
    stem_out: Array,
    kind: str,
    *,
    use_pallas: bool = True,
    interpret: bool = False,
) -> Dict[str, Array]:
    """Stem output → {"c3", "c4", "c5"}, identity blocks through the fused
    bottleneck kernel (``use_pallas=False`` runs the XLA composition for all
    blocks — the cross-check path)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if "backbone" in params:
        params = params["backbone"]
        stats = stats["backbone"]
    block_kind, depths = RESNET_SPECS[kind]
    assert block_kind == "bottleneck", kind

    x = stem_out.astype(jnp.bfloat16)
    widths = (64, 128, 256, 512)
    out: Dict[str, Array] = {}
    for stage, (depth, width) in enumerate(zip(depths, widths), start=1):
        for i in range(depth):
            blk = f"layer{stage}_block{i}"
            bp, bs = params[blk], stats[blk]
            strides = 2 if (i == 0 and stage > 1) else 1
            if (
                i > 0
                and use_pallas
                and fused_bottleneck_supported(x.shape, width)
            ):
                x = fused_bottleneck(bp, bs, x, interpret=interpret)
            else:
                x = _xla_bottleneck(bp, bs, x, strides)
        if stage >= 2:
            out[f"c{stage + 1}"] = x
    return out
