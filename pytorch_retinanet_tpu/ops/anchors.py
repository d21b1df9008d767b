"""Static anchor generation — a pure function of the (static) image size.

TPU-native rebuild of the reference's ``retinanet/anchors.py`` (a detectron2
fork). The reference regenerates identical anchor grids per image inside the
forward pass (anchors.py:199-228, a per-image python loop over meshgrids).
Because this framework runs on static resolution buckets, anchors are a pure
function of the image size: computed once in numpy at trace time, constant-folded
into the compiled XLA program, and shared across every image in the batch.

Layout contract (must match the head's reshape, see models/heads.py):
anchors are ordered level-major, then row-major over the feature grid
(y outer, x inner), then cell-anchor index — exactly the reference's ordering
(grid_anchors at anchors.py:172-197 plus the head permute at layers.py:189-195),
so decoded boxes line up index-for-index.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import numpy as np

from ..config import (
    ANCHOR_ASPECT_RATIOS,
    ANCHOR_OFFSET,
    ANCHOR_SIZES,
    ANCHOR_STRIDES,
)


def feature_grid_sizes(
    image_size: Tuple[int, int], strides: Sequence[int] = tuple(ANCHOR_STRIDES)
) -> List[Tuple[int, int]]:
    """Per-level (H, W) of the FPN feature maps for a given padded image size.

    Every stride-2 stage in the ResNet/FPN uses SAME padding, so each halving is
    ``ceil(H/2)``; iterated ceiling-halvings compose to ``ceil(H/stride)``.
    """
    h, w = image_size
    return [(math.ceil(h / s), math.ceil(w / s)) for s in strides]


def generate_cell_anchors(
    sizes: Sequence[float], aspect_ratios: Sequence[float]
) -> np.ndarray:
    """Canonical anchors centered at (0, 0), XYXY, shape [len(sizes)*len(ratios), 4].

    Size-major, ratio-minor ordering with w = sqrt(area/ratio), h = ratio * w
    (reference: generate_cell_anchors, anchors.py:111-135).
    """
    out = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, dtype=np.float32)


@functools.lru_cache(maxsize=32)
def generate_anchors_per_level(
    image_size: Tuple[int, int],
    sizes: Tuple[Tuple[float, ...], ...] = tuple(tuple(s) for s in ANCHOR_SIZES),
    aspect_ratios: Tuple[float, ...] = tuple(ANCHOR_ASPECT_RATIOS),
    strides: Tuple[int, ...] = tuple(ANCHOR_STRIDES),
    offset: float = ANCHOR_OFFSET,
) -> Tuple[np.ndarray, ...]:
    """Per-level anchors for one padded image size: tuple of [A_l, 4] f32 XYXY.

    The multilevel inference postprocess consumes these level-by-level
    (per-level top-k before any cross-level concat); the training path concats
    them via :func:`generate_anchors`.
    """
    grid_sizes = feature_grid_sizes(image_size, strides)
    per_level = []
    for (gh, gw), stride, level_sizes in zip(grid_sizes, strides, sizes):
        base = generate_cell_anchors(level_sizes, aspect_ratios)  # [A, 4]
        shift_x = (np.arange(gw, dtype=np.float32) + offset) * stride
        shift_y = (np.arange(gh, dtype=np.float32) + offset) * stride
        # y-outer, x-inner (reference meshgrid order, anchors.py:158-170)
        sx, sy = np.meshgrid(shift_x, shift_y)  # each [gh, gw]
        shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
        anchors = (shifts + base[None, :, :]).reshape(-1, 4)
        per_level.append(anchors.astype(np.float32))
    return tuple(per_level)


@functools.lru_cache(maxsize=32)
def generate_anchors(
    image_size: Tuple[int, int],
    sizes: Tuple[Tuple[float, ...], ...] = tuple(tuple(s) for s in ANCHOR_SIZES),
    aspect_ratios: Tuple[float, ...] = tuple(ANCHOR_ASPECT_RATIOS),
    strides: Tuple[int, ...] = tuple(ANCHOR_STRIDES),
    offset: float = ANCHOR_OFFSET,
) -> np.ndarray:
    """All anchors for one padded image size: [A_total, 4] float32 XYXY.

    A_total = sum over levels of H_l * W_l * (len(sizes_l) * len(ratios)).
    Cached: the first trace per resolution bucket pays the numpy cost, every
    subsequent trace reuses the array (and XLA sees it as a constant).
    """
    return np.concatenate(
        generate_anchors_per_level(image_size, sizes, aspect_ratios, strides, offset),
        axis=0,
    )


def num_anchors_per_location(
    sizes: Sequence[Sequence[float]] = ANCHOR_SIZES,
    aspect_ratios: Sequence[float] = ANCHOR_ASPECT_RATIOS,
) -> int:
    """Cell anchors per spatial location (A = sizes-per-level * ratios = 9 default)."""
    return len(sizes[0]) * len(aspect_ratios)
