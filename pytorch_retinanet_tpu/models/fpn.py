"""Feature Pyramid Network producing P3–P7 from C3/C4/C5.

TPU-native rebuild of the reference FPN (``retinanet/layers.py:12-64``):
1x1 lateral convs to 256 channels, nearest-neighbour top-down upsample + add,
3x3 smoothing convs; P6 = 3x3 stride-2 conv on C5; P7 = 3x3 stride-2 conv on
ReLU(P6). Kaiming-uniform init with bias zero, like the reference (layers.py:36-40).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp
from flax import linen as nn

from .layers import nearest_upsample_to

Array = jnp.ndarray
Dtype = Any


class FeaturePyramid(nn.Module):
    """5-level pyramid [P3, P4, P5, P6, P7], each `channels` wide, NHWC."""

    channels: int = 256
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, Array]) -> List[Array]:
        conv = lambda k, s, name: nn.Conv(  # noqa: E731
            self.channels,
            (k, k),
            strides=s,
            padding=[((k - 1) // 2, (k - 1) // 2)] * 2,
            use_bias=True,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        c3, c4, c5 = feats["c3"], feats["c4"], feats["c5"]

        m5 = conv(1, 1, "lateral_c5")(c5)
        m4 = conv(1, 1, "lateral_c4")(c4) + nearest_upsample_to(m5, c4.shape[1:3])
        m3 = conv(1, 1, "lateral_c3")(c3) + nearest_upsample_to(m4, c3.shape[1:3])

        p3 = conv(3, 1, "smooth_p3")(m3)
        p4 = conv(3, 1, "smooth_p4")(m4)
        p5 = conv(3, 1, "smooth_p5")(m5)
        p6 = conv(3, 2, "p6")(c5)
        p7 = conv(3, 2, "p7")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]
