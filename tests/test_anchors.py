"""Anchor generation tests: grid shapes, golden values, reference-order parity."""

import math

import numpy as np

from pytorch_retinanet_tpu.ops import (
    feature_grid_sizes,
    generate_anchors,
    generate_cell_anchors,
    num_anchors_per_location,
)


def test_feature_grid_sizes():
    sizes = feature_grid_sizes((800, 1344))
    assert sizes == [(100, 168), (50, 84), (25, 42), (13, 21), (7, 11)]


def test_feature_grid_iterated_ceil():
    # odd sizes: iterated ceil-halving == ceil(H / stride)
    sizes = feature_grid_sizes((801, 1001))
    assert sizes[0] == (math.ceil(801 / 8), math.ceil(1001 / 8))
    assert sizes[-1] == (math.ceil(801 / 128), math.ceil(1001 / 128))


def test_cell_anchors_golden():
    cells = generate_cell_anchors([32.0], [0.5, 1.0, 2.0])
    assert cells.shape == (3, 4)
    # ratio 1.0 -> square 32x32 centered at origin
    np.testing.assert_allclose(cells[1], [-16.0, -16.0, 16.0, 16.0], atol=1e-5)
    # ratio 0.5 -> w = sqrt(1024/0.5) = 45.25, h = 22.63
    w = math.sqrt(32.0 ** 2 / 0.5)
    h = 0.5 * w
    np.testing.assert_allclose(cells[0], [-w / 2, -h / 2, w / 2, h / 2], rtol=1e-5)
    # areas all equal size^2
    areas = (cells[:, 2] - cells[:, 0]) * (cells[:, 3] - cells[:, 1])
    np.testing.assert_allclose(areas, 32.0 ** 2, rtol=1e-5)


def test_anchor_count():
    anchors = generate_anchors((128, 128))
    grids = feature_grid_sizes((128, 128))
    expected = sum(h * w for h, w in grids) * num_anchors_per_location()
    assert anchors.shape == (expected, 4)
    assert anchors.dtype == np.float32


def test_anchor_ordering_matches_reference():
    """Level-major, y-major, x-minor, anchor-innermost — reference grid_anchors
    ordering (anchors.py:172-197) with offset 0.0 (config.py:42)."""
    anchors = generate_anchors((16, 16), sizes=((32.0,),), aspect_ratios=(1.0,), strides=(8,))
    # 2x2 grid, 1 anchor/cell: centers should be (0,0), (8,0), (0,8), (8,8)
    centers = (anchors[:, :2] + anchors[:, 2:]) / 2
    np.testing.assert_allclose(
        centers, [[0, 0], [8, 0], [0, 8], [8, 8]], atol=1e-5
    )


def test_anchor_reference_numerics():
    """Golden check vs a hand-rolled numpy emulation of the reference algorithm:
    shift grid (meshgrid y-outer) + base anchors (size-major, ratio-minor)."""
    image_size = (64, 96)
    anchors = generate_anchors(image_size)
    sizes = [[x, x * 2 ** (1 / 3), x * 2 ** (2 / 3)] for x in [32, 64, 128, 256, 512]]
    ratios = [0.5, 1.0, 2.0]
    strides = [8, 16, 32, 64, 128]
    expected = []
    for lsizes, stride in zip(sizes, strides):
        gh, gw = math.ceil(image_size[0] / stride), math.ceil(image_size[1] / stride)
        base = []
        for s in lsizes:
            for ar in ratios:
                w = math.sqrt(s * s / ar)
                h = ar * w
                base.append([-w / 2, -h / 2, w / 2, h / 2])
        base = np.array(base, dtype=np.float64)
        for y in range(gh):
            for x in range(gw):
                shift = np.array([x * stride, y * stride, x * stride, y * stride])
                expected.append(base + shift)
    expected = np.concatenate(expected, axis=0)
    np.testing.assert_allclose(anchors, expected, rtol=1e-5, atol=1e-3)


def test_anchor_cache_identity():
    a1 = generate_anchors((128, 128))
    a2 = generate_anchors((128, 128))
    assert a1 is a2  # lru_cache returns the same array per resolution bucket
