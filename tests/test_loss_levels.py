"""retinanet_loss_levels / one-hot-matmul gather regression tests.

The per-level loss must EXACTLY reproduce the concatenated-form loss (the
Trainer consumes per-level head outputs to skip the cross-level concat), and
the matched-GT one-hot matmul must reproduce take_along_axis semantics (it
replaced the gather for TPU performance — ops/losses.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_retinanet_tpu.ops import (
    generate_anchors,
    generate_anchors_per_level,
    retinanet_loss,
    retinanet_loss_levels,
)

IMAGE_SIZE = (256, 256)
C = 7


@pytest.fixture(scope="module")
def setup():
    anchors = jnp.asarray(generate_anchors(IMAGE_SIZE))
    per_level = [jnp.asarray(a) for a in generate_anchors_per_level(IMAGE_SIZE)]
    splits = np.cumsum([a.shape[0] for a in per_level])[:-1].tolist()
    A = anchors.shape[0]
    rng = np.random.default_rng(3)
    B, N = 3, 12
    cls = jnp.asarray(rng.normal(-3, 1.5, (B, A, C)), jnp.float32)
    reg = jnp.asarray(rng.normal(0, 0.3, (B, A, 4)), jnp.float32)
    cx = rng.uniform(30, 220, (B, N, 1))
    cy = rng.uniform(30, 220, (B, N, 1))
    w = rng.uniform(10, 120, (B, N, 1))
    h = rng.uniform(10, 120, (B, N, 1))
    boxes = jnp.asarray(
        np.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1),
        jnp.float32,
    )
    labels = jnp.asarray(rng.integers(1, C + 1, (B, N)), jnp.int32)
    valid = jnp.asarray(rng.random((B, N)) < 0.7, bool)
    return anchors, per_level, splits, cls, reg, boxes, labels, valid


class TestLossLevels:
    def test_equals_concat_form(self, setup):
        anchors, per_level, splits, cls, reg, boxes, labels, valid = setup
        full = retinanet_loss(
            cls, reg, anchors, boxes, labels, valid, num_classes=C
        )
        lvl = retinanet_loss_levels(
            jnp.split(cls, splits, axis=1), jnp.split(reg, splits, axis=1),
            per_level, boxes, labels, valid, num_classes=C,
        )
        for k in full:
            np.testing.assert_allclose(
                float(full[k]), float(lvl[k]), rtol=1e-5, err_msg=k
            )

    def test_equals_concat_form_per_image(self, setup):
        anchors, per_level, splits, cls, reg, boxes, labels, valid = setup
        full = retinanet_loss(
            cls, reg, anchors, boxes, labels, valid, num_classes=C,
            reduction="none",
        )
        lvl = retinanet_loss_levels(
            jnp.split(cls, splits, axis=1), jnp.split(reg, splits, axis=1),
            per_level, boxes, labels, valid, num_classes=C, reduction="none",
        )
        for k in full:
            np.testing.assert_allclose(
                np.asarray(full[k]), np.asarray(lvl[k]), rtol=1e-5, err_msg=k
            )

    def test_grads_match_concat_form(self, setup):
        anchors, per_level, splits, cls, reg, boxes, labels, valid = setup

        def f_full(c, r):
            l = retinanet_loss(c, r, anchors, boxes, labels, valid, num_classes=C)
            return l["classification_loss"] + l["regression_loss"]

        def f_lvl(c, r):
            l = retinanet_loss_levels(
                jnp.split(c, splits, axis=1), jnp.split(r, splits, axis=1),
                per_level, boxes, labels, valid, num_classes=C,
            )
            return l["classification_loss"] + l["regression_loss"]

        gc_f, gr_f = jax.grad(f_full, argnums=(0, 1))(cls, reg)
        gc_l, gr_l = jax.grad(f_lvl, argnums=(0, 1))(cls, reg)
        np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_l), rtol=1e-4, atol=1e-8)
        np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_l), rtol=1e-4, atol=1e-8)

    def test_onehot_matmul_gather_matches_take_along_axis(self, setup):
        """The matched-GT lookup inside the loss must agree with the direct
        gather it replaced, including padded/invalid-anchor rows."""
        anchors, _, _, _, _, boxes, labels, valid = setup
        from pytorch_retinanet_tpu.ops.matcher import match_anchors_batch

        matches, _ = match_anchors_batch(anchors, boxes, valid)
        safe = jnp.maximum(matches, 0)
        ref_boxes = jnp.take_along_axis(boxes, safe[..., None], axis=1)
        ref_labels = jnp.take_along_axis(labels, safe, axis=1)

        n_gt = boxes.shape[1]
        onehot = (safe[..., None] == jnp.arange(n_gt)).astype(jnp.float32)
        gt_cat = jnp.concatenate(
            [boxes, labels.astype(jnp.float32)[..., None]], axis=-1
        )
        gathered = jax.lax.dot_general(
            onehot, gt_cat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(gathered[..., :4]), np.asarray(ref_boxes), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(gathered[..., 4]).astype(np.int32), np.asarray(ref_labels)
        )

    def test_zero_valid_gt_finite(self, setup):
        _, per_level, splits, cls, reg, boxes, labels, valid = setup
        out = retinanet_loss_levels(
            jnp.split(cls, splits, axis=1), jnp.split(reg, splits, axis=1),
            per_level, boxes, labels, jnp.zeros_like(valid), num_classes=C,
        )
        for k, v in out.items():
            assert np.isfinite(float(v)), k
