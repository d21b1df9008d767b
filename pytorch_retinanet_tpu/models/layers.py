"""Shared NN building blocks for the TPU model stack.

TPU conventions used across every module in :mod:`pytorch_retinanet_tpu.models`:

* **NHWC layout** — the native layout for XLA:TPU convolutions (the reference's
  torch modules are NCHW; translating that layout would cost a transpose on
  every conv).
* **bfloat16 compute, float32 params** — convs/activations run in bf16 on the
  MXU; parameters and the loss live in f32. Controlled by the ``dtype`` /
  ``param_dtype`` attributes on each module.
* **Frozen batch-norm semantics** — the reference sets backbone BN layers to
  ``.eval()`` at construction when ``freeze_bn`` (reference:
  retinanet/backbone.py:340-360), i.e. running statistics are used always and
  never updated, while gamma/beta still receive gradients. ``BatchNorm`` here
  reproduces exactly that when ``frozen=True`` (and fixes the reference bug
  where a later ``model.train()`` silently unfreezes the stats, since here
  frozenness is part of the traced computation, not mutable module state).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray
Dtype = Any


class BatchNorm(nn.Module):
    """Batch norm with first-class frozen semantics.

    frozen=True: y = gamma * (x - running_mean)/sqrt(running_var + eps) + beta,
    statistics never updated (torch ``.eval()`` BN — reference
    backbone.py:348-351). frozen=False behaves like regular train-mode BN when
    ``use_running_average=False``.
    """

    frozen: bool = True
    eps: float = 1e-5  # torch BatchNorm2d default
    momentum: float = 0.9  # flax momentum = 1 - torch momentum (0.1)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        return nn.BatchNorm(
            use_running_average=self.frozen or use_running_average,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


def conv_kaiming(
    features: int,
    kernel: Tuple[int, int],
    strides: int = 1,
    use_bias: bool = False,
    dtype: Dtype = jnp.bfloat16,
    param_dtype: Dtype = jnp.float32,
    name: str | None = None,
    mode: str = "fan_out",
) -> nn.Conv:
    """3x3/1x1/7x7 conv with torch-style kaiming-normal init (ResNet default).

    torch initializes ResNet convs with kaiming_normal(fan_out, relu)
    (reference backbone.py:200-202); flax's ``he_normal`` is the same
    distribution for ``fan_out`` mode.

    Padding is explicit torch-style ``(k-1)//2`` on BOTH sides: XLA's SAME
    padding is asymmetric for strided convs on even inputs, which would shift
    features by one pixel relative to torch-pretrained weights.
    """
    pad = [((k - 1) // 2, (k - 1) // 2) for k in kernel]
    return nn.Conv(
        features,
        kernel,
        strides=strides,
        padding=pad,
        use_bias=use_bias,
        kernel_init=nn.initializers.variance_scaling(2.0, mode, "truncated_normal"),
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def max_pool_torch(x: Array, window: int, strides: int) -> Array:
    """Max-pool with torch-style symmetric ``(k-1)//2`` padding (stem maxpool 3x3 s2 p1)."""
    p = (window - 1) // 2
    return nn.max_pool(
        x,
        (window, window),
        strides=(strides, strides),
        padding=((p, p), (p, p)),
    )


def space_to_depth_2x(x: Array) -> Array:
    """[B, H, W, C] → [B, H/2, W/2, 4C], channel order (dy, dx, c).

    The MXU wants ≥128-lane contractions; a stride-2 conv on a 3-channel
    image achieves neither. Packing 2x2 pixel blocks into channels turns the
    stem's 7x7-s2 conv into an EXACTLY equivalent 4x4-s1 conv over 12 input
    channels (see :func:`stem_kernel_to_s2d`) — the standard MLPerf ResNet
    space-to-depth optimization.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def stem_kernel_to_s2d(kernel_7x7: "np.ndarray | Array"):
    """Transform a [7,7,Cin,Cout] stride-2 stem kernel into the [4,4,4*Cin,Cout]
    stride-1 kernel that computes the identical convolution on
    :func:`space_to_depth_2x` input (with padding (2,1) per spatial dim).

    Derivation: with torch padding 3, ``out[i] = Σ_k w[k] x[2i+k-3]``; writing
    ``k-3 = 2(a-2) + d`` (a ∈ [0,4), d ∈ {0,1}) gives a 4-tap conv over the
    packed input with one zero tap (k=-1). Zero-padding the kernel to 8 at the
    top-left realizes that in one reshape.
    """
    import numpy as _np

    k = _np.asarray(kernel_7x7)
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (7, 7), f"expected a 7x7 stem kernel, got {k.shape}"
    k8 = _np.zeros((8, 8, cin, cout), k.dtype)
    k8[1:, 1:] = k  # zero row/col at top-left: index k8 = (orig + 1)
    # [8,8,cin,cout] -> [4,2,4,2,cin,cout] -> [4,4,2,2,cin,cout] -> [4,4,4cin,cout]
    k4 = k8.reshape(4, 2, 4, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return k4.reshape(4, 4, 4 * cin, cout)


def nearest_upsample_to(x: Array, target_hw: Sequence[int]) -> Array:
    """Nearest-neighbour upsample of NHWC `x` to an exact (H, W).

    The FPN top-down path upsamples each level to the (possibly odd) size of
    the lateral below it (reference layers.py:53-57 uses F.interpolate(size=..,
    mode="nearest")). For the 2x case this is a repeat + slice — pure data
    movement XLA lowers to a cheap broadcast, no gather.
    """
    n, h, w, c = x.shape
    th, tw = int(target_hw[0]), int(target_hw[1])
    rh, rw = -(-th // h), -(-tw // w)  # ceil ratios (2 for FPN)
    y = jnp.repeat(jnp.repeat(x, rh, axis=1), rw, axis=2)
    return y[:, :th, :tw, :]
