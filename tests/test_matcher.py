"""Unit tests for the anchor matcher (fg/bg/ignore semantics, padding, batching)."""

import numpy as np
import jax.numpy as jnp

from pytorch_retinanet_tpu.ops import (
    BACKGROUND,
    IGNORE,
    match_anchors,
    match_anchors_batch,
)


def test_matcher_thresholds():
    anchors = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],   # IoU 1.0 with gt0 -> fg idx 0
            [100.0, 100.0, 110.0, 110.0],  # IoU 0 -> background
            [0.0, 0.0, 10.0, 22.0],   # IoU with gt0 = 100/220 ≈ 0.4545 -> ignore
        ]
    )
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    valid = jnp.array([True])
    res = match_anchors(anchors, gt, valid)
    np.testing.assert_array_equal(np.asarray(res.matches), [0, BACKGROUND, IGNORE])


def test_matcher_strict_inequalities():
    """fg uses strict > 0.5 and bg strict < 0.4 (reference box_utils.py:78-79)."""
    # anchor/gt with IoU exactly 0.5: gt area 10x10, anchor 10x20 overlapping 10x10
    anchors = jnp.array([[0.0, 0.0, 10.0, 20.0]])
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    res = match_anchors(anchors, gt, jnp.array([True]))
    assert int(res.matches[0]) == IGNORE  # exactly 0.5 is not > 0.5

    # IoU exactly 0.4: gt 10x10, anchor 10x25 -> 100/250 = 0.4 => not < 0.4 => ignore
    anchors = jnp.array([[0.0, 0.0, 10.0, 25.0]])
    res = match_anchors(anchors, gt, jnp.array([True]))
    assert int(res.matches[0]) == IGNORE


def test_matcher_argmax_best_gt():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gt = jnp.array(
        [[0.0, 0.0, 10.0, 12.0], [0.0, 0.0, 10.0, 10.5]]  # second overlaps more
    )
    res = match_anchors(anchors, gt, jnp.array([True, True]))
    assert int(res.matches[0]) == 1


def test_matcher_padding_rows_never_match():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    valid = jnp.array([False, True])  # row 0 is padding despite perfect IoU
    res = match_anchors(anchors, gt, valid)
    assert int(res.matches[0]) == 1


def test_matcher_empty_gt_all_ignore():
    """Zero GT => every anchor ignored (reference box_utils.py:70-71)."""
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 9.0, 9.0]])
    gt = jnp.zeros((3, 4))
    res = match_anchors(anchors, gt, jnp.zeros((3,), dtype=bool))
    np.testing.assert_array_equal(np.asarray(res.matches), [IGNORE, IGNORE])


def test_matcher_batch(rng):
    anchors = jnp.asarray(rng.uniform(0, 50, (20, 2)).astype(np.float32))
    anchors = jnp.concatenate([anchors, anchors + 10.0], axis=1)
    gt = jnp.asarray(rng.uniform(0, 30, (4, 5, 2)).astype(np.float32))
    gt = jnp.concatenate([gt, gt + 15.0], axis=-1)
    valid = jnp.asarray(rng.uniform(size=(4, 5)) > 0.3)
    batched = match_anchors_batch(anchors, gt, valid)
    for i in range(4):
        single = match_anchors(anchors, gt[i], valid[i])
        np.testing.assert_array_equal(
            np.asarray(batched.matches[i]), np.asarray(single.matches)
        )
