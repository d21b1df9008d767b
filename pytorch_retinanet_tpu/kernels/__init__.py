"""Pallas TPU kernels for the detection hot path.

XLA's fusion already handles most of this model (convs on the MXU, elementwise
fused into reductions); kernels live here only where the compiler cannot be
relied on to keep the working set on-chip:

* :mod:`.nms_pallas` — greedy NMS whose IoU matrix + suppression fixpoint stay
  in VMEM across ``while_loop`` iterations.
* :mod:`.stem_pallas` — fused ResNet stem (7x7-s2 conv + frozen BN + ReLU +
  3x3-s2 maxpool) as one GEMM-per-row kernel; XLA runs this region at
  ~8 TFLOP/s (tools/profile_backbone.py) because the 3-channel conv defeats
  its tiling.

Every kernel has a pure-XLA equivalent in :mod:`..ops` or
:mod:`.stem_pallas.stem_reference_xla`; selection happens at the call sites
(``use_pallas`` flags / inference gating) with parity enforced by tests.
"""

from .bottleneck_pallas import (
    bottleneck_reference_xla,
    fused_bottleneck,
    fused_bottleneck_supported,
)
from .nms_pallas import pallas_nms_keep_mask, tpu_available
from .select_pallas import pallas_top2_classes, top2_reference_xla
from .stem_pallas import fused_stem, fused_stem_supported, stem_reference_xla

__all__ = [
    "pallas_nms_keep_mask",
    "tpu_available",
    "fused_stem",
    "fused_stem_supported",
    "fused_bottleneck",
    "fused_bottleneck_supported",
    "bottleneck_reference_xla",
    "stem_reference_xla",
    "pallas_top2_classes",
    "top2_reference_xla",
]
