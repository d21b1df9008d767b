"""Unit tests for ops.boxes: conversions, encode/decode, IoU, clipping."""

import numpy as np
import jax.numpy as jnp
import pytest

from pytorch_retinanet_tpu.ops import (
    box_area,
    box_iou,
    clip_boxes,
    cxcywh_to_xyxy,
    decode_boxes,
    encode_boxes,
    rescale_boxes,
    small_box_mask,
    xyxy_to_cxcywh,
)


def random_boxes(rng, n, size=100.0):
    lo = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([lo, lo + wh], axis=1).astype(np.float32)


def test_xyxy_cxcywh_roundtrip(rng):
    b = random_boxes(rng, 17)
    out = np.asarray(cxcywh_to_xyxy(xyxy_to_cxcywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-4)


def test_xyxy_to_cxcywh_golden():
    b = jnp.array([[0.0, 0.0, 10.0, 20.0]])
    np.testing.assert_allclose(
        np.asarray(xyxy_to_cxcywh(b)), [[5.0, 10.0, 10.0, 20.0]]
    )


def test_encode_decode_roundtrip(rng):
    boxes = random_boxes(rng, 64)
    anchors = random_boxes(rng, 64)
    deltas = encode_boxes(jnp.asarray(boxes), jnp.asarray(anchors))
    rec = np.asarray(decode_boxes(deltas, jnp.asarray(anchors)))
    np.testing.assert_allclose(rec, boxes, rtol=1e-4, atol=1e-2)


def test_encode_golden():
    # anchor (0,0,10,10): center (5,5) size (10,10); gt (5,5,15,15): center (10,10)
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gt = jnp.array([[5.0, 5.0, 15.0, 15.0]])
    d = np.asarray(encode_boxes(gt, anchors))
    np.testing.assert_allclose(d, [[0.5, 0.5, np.log(1.0 + 1e-8), np.log(1.0 + 1e-8)]], atol=1e-6)


def test_encode_weights():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gt = jnp.array([[5.0, 5.0, 15.0, 15.0]])
    d = np.asarray(encode_boxes(gt, anchors, weights=(2.0, 3.0, 4.0, 5.0)))
    np.testing.assert_allclose(d[0, :2], [1.0, 1.5], atol=1e-6)


def test_decode_is_correct_inverse_not_reference_bug():
    """The reference's activ_2_bbox (box_utils.py:46) reuses the center deltas
    for the size decode; ours must use the size components."""
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.array([[0.0, 0.0, np.log(2.0), np.log(3.0)]])
    out = np.asarray(decode_boxes(deltas, anchors))
    # center stays (5,5); size becomes (20, 30)
    np.testing.assert_allclose(out, [[-5.0, -10.0, 15.0, 20.0]], atol=1e-4)


def test_decode_clips_extreme_deltas():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.array([[0.0, 0.0, 100.0, 100.0]])
    out = np.asarray(decode_boxes(deltas, anchors))
    assert np.all(np.isfinite(out))


def test_box_iou_golden():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array(
        [[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]]
    )
    iou = np.asarray(box_iou(a, b))
    np.testing.assert_allclose(iou, [[1.0, 25.0 / 175.0, 0.0]], atol=1e-6)


def test_box_iou_zero_padding_rows():
    a = jnp.zeros((3, 4))
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    iou = np.asarray(box_iou(a, b))
    np.testing.assert_allclose(iou, 0.0)


def test_box_area():
    assert float(box_area(jnp.array([0.0, 0.0, 3.0, 4.0]))) == 12.0
    # degenerate box clamps to 0
    assert float(box_area(jnp.array([5.0, 5.0, 1.0, 1.0]))) == 0.0


def test_clip_boxes():
    b = jnp.array([[-5.0, -5.0, 50.0, 200.0]])
    out = np.asarray(clip_boxes(b, (100, 40)))  # H=100, W=40
    np.testing.assert_allclose(out, [[0.0, 0.0, 40.0, 100.0]])


def test_clip_boxes_traced_size():
    b = jnp.array([[-5.0, -5.0, 50.0, 200.0]])
    out = np.asarray(clip_boxes(b, jnp.array([100.0, 40.0])))
    np.testing.assert_allclose(out, [[0.0, 0.0, 40.0, 100.0]])


def test_small_box_mask():
    b = jnp.array([[0, 0, 1, 1], [0, 0, 0.001, 5], [2, 2, 2.005, 2.005]], dtype=jnp.float32)
    mask = np.asarray(small_box_mask(b, min_size=1e-2))
    np.testing.assert_array_equal(mask, [True, False, False])


def test_rescale_boxes():
    b = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    out = np.asarray(
        rescale_boxes(b, jnp.array([100.0, 200.0]), jnp.array([50.0, 100.0]))
    )
    np.testing.assert_allclose(out, [[5.0, 10.0, 15.0, 20.0]])


@pytest.mark.parametrize("batch_shape", [(), (2,), (2, 3)])
def test_shape_polymorphism(rng, batch_shape):
    b = rng.uniform(0, 50, batch_shape + (5, 4)).astype(np.float32)
    a = rng.uniform(0, 50, batch_shape + (5, 4)).astype(np.float32)
    assert encode_boxes(jnp.asarray(b), jnp.asarray(a)).shape == batch_shape + (5, 4)
    assert box_iou(jnp.asarray(b), jnp.asarray(a)).shape == batch_shape + (5, 5)
