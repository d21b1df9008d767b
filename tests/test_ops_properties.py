"""Property-based tests for the box-math core (hypothesis)."""

import numpy as np
import pytest

import jax.numpy as jnp

try:
    from hypothesis import given, settings, strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

from pytorch_retinanet_tpu.ops import (
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    nms_keep_mask,
)

pytestmark = pytest.mark.skipif(not HAS_HYPOTHESIS, reason="hypothesis unavailable")


def boxes_strategy(n):
    coord = st.floats(0.0, 500.0, allow_nan=False, width=32)
    side = st.floats(1.0, 200.0, allow_nan=False, width=32)
    return st.lists(
        st.tuples(coord, coord, side, side), min_size=n, max_size=n
    ).map(
        lambda rows: np.asarray(
            [[x, y, x + w, y + h] for x, y, w, h in rows], np.float32
        )
    )


@settings(max_examples=25, deadline=None)
@given(boxes_strategy(6), boxes_strategy(6))
def test_encode_decode_inverse(gt, anchors):
    deltas = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
    rec = np.asarray(decode_boxes(deltas, jnp.asarray(anchors)))
    np.testing.assert_allclose(rec, gt, rtol=1e-3, atol=0.1)


@settings(max_examples=25, deadline=None)
@given(boxes_strategy(5), boxes_strategy(7))
def test_iou_bounds_and_symmetry(a, b):
    iou_ab = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    iou_ba = np.asarray(box_iou(jnp.asarray(b), jnp.asarray(a)))
    assert np.all(iou_ab >= 0.0) and np.all(iou_ab <= 1.0 + 1e-6)
    np.testing.assert_allclose(iou_ab, iou_ba.T, rtol=1e-6)


@settings(max_examples=25, deadline=None)
@given(boxes_strategy(4))
def test_self_iou_diagonal_is_one(a):
    iou = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-5)


@settings(max_examples=25, deadline=None)
@given(boxes_strategy(8))
def test_clip_boxes_idempotent_and_bounded(a):
    c1 = np.asarray(clip_boxes(jnp.asarray(a), (300, 400)))
    c2 = np.asarray(clip_boxes(jnp.asarray(c1), (300, 400)))
    np.testing.assert_allclose(c1, c2)
    assert c1[:, 0::2].max() <= 400 and c1[:, 1::2].max() <= 300
    assert c1.min() >= 0.0


@settings(max_examples=15, deadline=None)
@given(boxes_strategy(16))
def test_nms_keep_mask_invariants(a):
    """Kept set is non-empty when any valid candidate exists, and no two kept
    boxes overlap above the threshold."""
    keep = np.asarray(
        nms_keep_mask(jnp.asarray(a), jnp.zeros(len(a), np.float32), 0.5)
    )
    assert keep.any()
    kept = a[keep]
    iou = np.array(box_iou(jnp.asarray(kept), jnp.asarray(kept)))  # writable copy
    np.fill_diagonal(iou, 0.0)
    assert iou.max() <= 0.5 + 1e-6
