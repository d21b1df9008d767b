"""ResNet-18/34/50/101/152 feature extractors, NHWC / bf16, frozen-BN aware.

TPU-native rebuild of the reference backbone (``retinanet/backbone.py``): a
ResNet trimmed to return the C3/C4/C5 feature maps (the reference's
``_forward_impl`` returns ``layer_2/3/4`` at backbone.py:246-263). Bottleneck
blocks use the ResNet-V1.5 stride placement (stride on the 3x3, reference
backbone.py:83-136) so torch-pretrained ImageNet weights port tensor-for-tensor
(see :mod:`.converter`).

Differences from the reference, all layout/runtime, not semantic:
  * NHWC + bf16 compute (see models/layers.py docstring).
  * ``freeze_bn`` is part of the traced computation: frozen BN always uses the
    stored statistics, so it cannot be silently un-frozen by a train-mode flag
    (the reference freezes by calling ``.eval()`` once at construction,
    backbone.py:348-351, which a later ``.train()`` reverts).
  * Weight loading is an explicit converter step rather than a ctor-time
    download (reference backbone.py:269-274 downloads from the torchvision
    model zoo inside ``_resnet``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, conv_kaiming, max_pool_torch, space_to_depth_2x

Array = jnp.ndarray
Dtype = Any

# (block kind, stage depths) per architecture — reference backbone.py:277-328.
RESNET_SPECS: Dict[str, Tuple[str, Tuple[int, int, int, int]]] = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}

# Reference __small__/__big__ split (models.py:17-18) decides FPN input sizes.
BACKBONE_OUT_CHANNELS: Dict[str, Tuple[int, int, int]] = {
    "resnet18": (128, 256, 512),
    "resnet34": (128, 256, 512),
    "resnet50": (512, 1024, 2048),
    "resnet101": (512, 1024, 2048),
    "resnet152": (512, 1024, 2048),
}


def _s2d_stem_init(key, shape, dtype):
    """Init for the space-to-depth stem: sample the canonical 7x7 kernel
    (kaiming-normal fan_out, like conv_kaiming) then repack it with
    :func:`..models.layers.stem_kernel_to_s2d` — jnp ops so it traces."""
    kh, kw, cin4, cout = shape
    assert (kh, kw) == (4, 4) and cin4 % 4 == 0, shape
    cin = cin4 // 4
    base = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")(
        key, (7, 7, cin, cout), dtype
    )
    k8 = jnp.zeros((8, 8, cin, cout), dtype).at[1:, 1:].set(base)
    k4 = k8.reshape(4, 2, 4, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return k4.reshape(4, 4, 4 * cin, cout)


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity shortcut (reference backbone.py:38-80)."""

    features: int
    strides: int = 1
    freeze_bn: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bn = lambda name: BatchNorm(  # noqa: E731
            frozen=self.freeze_bn, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        conv = lambda f, k, s, name: conv_kaiming(  # noqa: E731
            f, (k, k), s, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        residual = x
        y = conv(self.features, 3, self.strides, "conv1")(x)
        y = nn.relu(bn("bn1")(y, not train))
        y = conv(self.features, 3, 1, "conv2")(y)
        y = bn("bn2")(y, not train)
        if self.strides != 1 or x.shape[-1] != self.features:
            residual = conv(self.features, 1, self.strides, "downsample_conv")(x)
            residual = bn("downsample_bn")(residual, not train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 → 3x3(stride) → 1x1(×4) bottleneck, ResNet-V1.5 (reference backbone.py:83-136)."""

    features: int  # bottleneck width; output channels = features * 4
    strides: int = 1
    freeze_bn: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bn = lambda name: BatchNorm(  # noqa: E731
            frozen=self.freeze_bn, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        conv = lambda f, k, s, name: conv_kaiming(  # noqa: E731
            f, (k, k), s, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        out_features = self.features * 4
        residual = x
        y = conv(self.features, 1, 1, "conv1")(x)
        y = nn.relu(bn("bn1")(y, not train))
        y = conv(self.features, 3, self.strides, "conv2")(y)  # V1.5: stride here
        y = nn.relu(bn("bn2")(y, not train))
        y = conv(out_features, 1, 1, "conv3")(y)
        y = bn("bn3")(y, not train)
        if self.strides != 1 or x.shape[-1] != out_features:
            residual = conv(out_features, 1, self.strides, "downsample_conv")(x)
            residual = bn("downsample_bn")(residual, not train)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """ResNet trunk returning {"c3", "c4", "c5"} NHWC feature maps.

    Strides relative to the input: c3=8, c4=16, c5=32 (matching the FPN's
    expectations and the anchor strides, reference config.py:34).
    """

    kind: str = "resnet50"
    freeze_bn: bool = True
    remat: bool = False  # rematerialize each block's activations in backward
    # Space-to-depth stem: exactly-equivalent 4x4-s1 conv over 12 channels
    # instead of 7x7-s2 over 3 (see layers.space_to_depth_2x). Measured neutral
    # on v5e at 800px (XLA already handles the 3-channel stem well there), so
    # default off; kept as an opt-in for other chips/resolutions.
    stem_s2d: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, images: Array, train: bool = False, stem_in: Array | None = None
    ) -> Dict[str, Array]:
        block_kind, depths = RESNET_SPECS[self.kind]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        if self.remat:
            # jax.checkpoint per residual block: trade ~2x block recompute in
            # the backward pass for not storing intermediate activations —
            # the standard HBM-for-FLOPs trade for large-batch training.
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        if stem_in is not None:
            # Precomputed stem output (the fused Pallas stem kernel,
            # kernels/stem_pallas.py) — skip conv/bn/maxpool entirely.
            return self._trunk(stem_in.astype(self.dtype), train, block_cls, depths)
        x = images.astype(self.dtype)

        # Stem: 7x7 s2 conv + BN + relu + 3x3 s2 maxpool (reference backbone.py:180-189)
        if self.stem_s2d:
            x = space_to_depth_2x(x)
            x = nn.Conv(
                64,
                (4, 4),
                strides=1,
                padding=[(2, 1), (2, 1)],
                use_bias=False,
                # Sample a 7x7 stem kernel and repack it, so from-scratch init
                # is statistically identical to the default stem (a direct
                # variance_scaling over the (4,4,12,C) shape would use a ~3x
                # smaller fan_out and start from a different operating point).
                kernel_init=_s2d_stem_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="stem_conv",
            )(x)
        else:
            x = conv_kaiming(
                64, (7, 7), 2, dtype=self.dtype, param_dtype=self.param_dtype,
                name="stem_conv",
            )(x)
        x = nn.relu(
            BatchNorm(
                frozen=self.freeze_bn,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="stem_bn",
            )(x, not train)
        )
        x = max_pool_torch(x, 3, 2)
        return self._trunk(x, train, block_cls, depths)

    def _trunk(self, x: Array, train: bool, block_cls, depths) -> Dict[str, Array]:
        outputs: Dict[str, Array] = {}
        widths = (64, 128, 256, 512)
        for stage, (depth, width) in enumerate(zip(depths, widths), start=1):
            for i in range(depth):
                strides = 2 if (i == 0 and stage > 1) else 1
                x = block_cls(
                    features=width,
                    strides=strides,
                    freeze_bn=self.freeze_bn,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage}_block{i}",
                )(x, train)
            if stage >= 2:
                outputs[f"c{stage + 1}"] = x
        return outputs


def backbone_out_channels(kind: str) -> Tuple[int, int, int]:
    """(C3, C4, C5) channel sizes — replaces the reference's runtime probing
    with dummy forward passes (models.py:135-150): channel sizes are static
    facts of the architecture."""
    return BACKBONE_OUT_CHANNELS[kind]
