"""Pallas TPU kernels for the detection hot path.

XLA's fusion already handles most of this model (convs on the MXU, elementwise
fused into reductions); kernels live here only where the compiler cannot be
relied on to keep the working set on-chip:

* :mod:`.nms_pallas` — greedy NMS whose IoU matrix + suppression fixpoint stay
  in VMEM across ``while_loop`` iterations.

Every kernel has a pure-XLA equivalent in :mod:`..ops`; selection happens in
the op layer (``use_pallas`` flags) with parity enforced by tests.
"""

from .nms_pallas import pallas_nms_keep_mask, tpu_available

__all__ = ["pallas_nms_keep_mask", "tpu_available"]
