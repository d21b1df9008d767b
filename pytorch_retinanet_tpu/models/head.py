"""RetinaNet classification + box regression subnets.

TPU-native rebuild of the reference head (``retinanet/layers.py:67-260``): two
parallel subnets — 4×(3x3 conv 256 + ReLU) plus a predictor conv — whose
parameters are SHARED across all pyramid levels (one flax module applied to
each level). The class predictor's bias is initialized to
``-log((1 - prior)/prior)`` with prior=0.01 (reference layers.py:174-178) so
training starts with ~prior foreground probability everywhere.

Output layout contract: per level, the NHWC predictor output ``[N, H, W, A*K]``
is reshaped to ``[N, H*W*A, K]`` — row-major over the grid with the cell-anchor
index innermost — then concatenated level-major. This is exactly the ordering of
:func:`pytorch_retinanet_tpu.ops.generate_anchors` and of the reference's
permute+reshape (layers.py:189-195), so logits and anchors line up
index-for-index.
"""

from __future__ import annotations

import math
from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray
Dtype = Any


class _Subnet(nn.Module):
    """4 conv+ReLU layers then a predictor conv; shared across levels."""

    mid_channels: int
    out_channels: int
    depth: int = 4
    predictor_bias_init: float = 0.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # Reference init: normal(std=0.01), bias 0 (layers.py:167-172, 236-241).
        conv = lambda f, bias_init, name: nn.Conv(  # noqa: E731
            f,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_init),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        for i in range(self.depth):
            x = nn.relu(conv(self.mid_channels, 0.0, f"conv{i}")(x))
        return conv(self.out_channels, self.predictor_bias_init, "predictor")(x)


class RetinaNetHead(nn.Module):
    """Class + box subnets over the pyramid → ([N, HWA_total, K], [N, HWA_total, 4])."""

    num_classes: int
    num_anchors: int = 9
    channels: int = 256
    prior: float = 0.01
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, pyramid: List[Array], return_levels: bool = False
    ) -> Tuple[Array, Array]:
        cls_subnet = _Subnet(
            self.channels,
            self.num_anchors * self.num_classes,
            predictor_bias_init=-math.log((1.0 - self.prior) / self.prior),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cls_subnet",
        )
        box_subnet = _Subnet(
            self.channels,
            self.num_anchors * 4,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="box_subnet",
        )
        cls_out, box_out = [], []
        for level in pyramid:
            n = level.shape[0]
            c = cls_subnet(level)  # [N, H, W, A*K]
            b = box_subnet(level)  # [N, H, W, A*4]
            cls_out.append(c.reshape(n, -1, self.num_classes))
            box_out.append(b.reshape(n, -1, 4))
        if return_levels:
            # Inference path: per-level outputs (compute dtype) so the
            # postprocess can top-k before any cross-level concat.
            return cls_out, box_out
        # Training path: concat for the dense loss over all anchors; the f32
        # cast happens at the loss boundary.
        return (
            jnp.concatenate(cls_out, axis=1).astype(jnp.float32),
            jnp.concatenate(box_out, axis=1).astype(jnp.float32),
        )
