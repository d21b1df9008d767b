"""Match+targets Pallas kernel: EXACT parity with the XLA loss composition.

The kernel (kernels/match_pallas.py) mirrors ops.matcher.match_anchors_batch
+ the one-hot-matmul matched-GT lookup + ops.boxes.encode_boxes op-for-op in
f32, so every test here asserts bitwise equality (assert_array_equal), not
tolerances — any drift means a semantic divergence, not noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_retinanet_tpu.kernels.match_pallas import match_targets
from pytorch_retinanet_tpu.ops.boxes import encode_boxes
from pytorch_retinanet_tpu.ops.losses import retinanet_loss_levels
from pytorch_retinanet_tpu.ops.matcher import match_anchors_batch


def reference_targets(anchors, gt_boxes, gt_labels, gt_valid, fg=0.5, bg=0.4,
                      weights=(1.0, 1.0, 1.0, 1.0)):
    """The XLA composition from ops.losses._loss_sums, verbatim."""
    matches, _ = match_anchors_batch(anchors, gt_boxes, gt_valid, fg, bg)
    fg_mask = matches >= 0
    n_gt = gt_boxes.shape[1]
    safe_idx = jnp.maximum(matches, 0)
    onehot = (
        safe_idx[..., None] == jnp.arange(n_gt, dtype=jnp.int32)
    ).astype(jnp.float32)
    gt_cat = jnp.concatenate(
        [gt_boxes.astype(jnp.float32),
         gt_labels.astype(jnp.float32)[..., None]], axis=-1
    )
    gathered = jax.lax.dot_general(
        onehot, gt_cat, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    reg_targets = encode_boxes(gathered[..., :4], anchors[None], weights)
    fg_labels = jnp.where(fg_mask, gathered[..., 4].astype(jnp.int32), 0)
    return matches, fg_labels, reg_targets


def random_case(rng, b=2, a=300, n=13, n_valid=None, num_classes=7,
                spread=800.0):
    ctr = rng.uniform(0, spread, (a, 2))
    wh = rng.uniform(8, 256, (a, 2))
    anchors = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    gctr = rng.uniform(0, spread, (b, n, 2))
    gwh = rng.uniform(8, 300, (b, n, 2))
    gt = np.concatenate([gctr - gwh / 2, gctr + gwh / 2], -1).astype(np.float32)
    labels = rng.integers(1, num_classes + 1, (b, n)).astype(np.int32)
    if n_valid is None:
        valid = rng.uniform(size=(b, n)) > 0.3
    else:
        valid = np.arange(n)[None] < np.asarray(n_valid)[:, None]
    gt = np.where(valid[..., None], gt, 0.0).astype(np.float32)
    labels = np.where(valid, labels, 0).astype(np.int32)
    return (jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
            jnp.asarray(valid))


def assert_exact(anchors, gt, labels, valid, tile=256):
    got = match_targets(anchors, gt, labels, valid, fg_iou_thr=0.5,
                        bg_iou_thr=0.4, tile=tile, interpret=True)
    ref = reference_targets(anchors, gt, labels, valid)
    for g, r, name in zip(got, ref, ("matches", "fg_labels", "reg_targets")):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(r), err_msg=name
        )


class TestMatchKernelParity:
    def test_random_exact(self, rng):
        for trial in range(4):
            assert_exact(*random_case(rng))

    def test_anchor_count_not_tile_multiple(self, rng):
        # A=300 with tile=256 pads to 512; padded lanes must be sliced off.
        assert_exact(*random_case(rng, a=300), tile=256)
        assert_exact(*random_case(rng, a=37), tile=256)

    def test_gt_rows_not_multiple_of_8(self, rng):
        assert_exact(*random_case(rng, n=13))
        assert_exact(*random_case(rng, n=1))
        assert_exact(*random_case(rng, n=130))  # > one sublane tile of 128

    def test_zero_valid_gt_all_ignored(self, rng):
        anchors, gt, labels, valid = random_case(rng, b=3, n_valid=[5, 0, 2])
        got = match_targets(anchors, gt, labels, valid, fg_iou_thr=0.5,
                            bg_iou_thr=0.4, tile=256, interpret=True)
        assert np.all(np.asarray(got[0][1]) == -2)  # image 1: no GT
        assert np.all(np.asarray(got[1][1]) == 0)
        assert_exact(anchors, gt, labels, valid)

    def test_tie_takes_first_gt(self):
        # Two identical GT boxes: the matcher's argmax takes the first.
        anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]], jnp.float32)
        gt = jnp.asarray(
            [[[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]]], jnp.float32
        )
        labels = jnp.asarray([[3, 5]], jnp.int32)
        valid = jnp.ones((1, 2), bool)
        matches, fg_labels, _ = match_targets(
            anchors, gt, labels, valid, fg_iou_thr=0.5, bg_iou_thr=0.4,
            tile=128, interpret=True,
        )
        assert int(matches[0, 0]) == 0
        assert int(fg_labels[0, 0]) == 3
        assert_exact(anchors, gt, labels, valid, tile=128)

    def test_exact_threshold_is_ignore(self):
        # inter 0.5 / union 1.0 = IoU exactly 0.5: strict > makes it IGNORE
        # (reference box_utils.py:79), and exactly-0.4 stays IGNORE too
        # (strict <).
        anchors = jnp.asarray(
            [[0.0, 0.0, 1.0, 0.5], [0.0, 0.0, 1.0, 0.4]], jnp.float32
        )
        gt = jnp.asarray([[[0.0, 0.0, 1.0, 1.0]]], jnp.float32)
        labels = jnp.asarray([[1]], jnp.int32)
        valid = jnp.ones((1, 1), bool)
        matches, _, _ = match_targets(
            anchors, gt, labels, valid, fg_iou_thr=0.5, bg_iou_thr=0.4,
            tile=128, interpret=True,
        )
        iou0 = 0.5  # exactly representable; (1*0.5) / (1*1)
        assert iou0 == 0.5
        assert int(matches[0, 0]) == -2
        assert_exact(anchors, gt, labels, valid, tile=128)


class TestLossWithMatchKernel:
    def _case(self, rng, num_classes=6):
        from pytorch_retinanet_tpu.ops import generate_anchors_per_level

        size = (64, 96)
        anchors_levels = [
            jnp.asarray(a) for a in generate_anchors_per_level(size)
        ]
        b = 2
        cls_levels = [
            jnp.asarray(
                rng.standard_normal((b, a.shape[0], num_classes)), jnp.float32
            )
            for a in anchors_levels
        ]
        box_levels = [
            jnp.asarray(rng.standard_normal((b, a.shape[0], 4)), jnp.float32)
            for a in anchors_levels
        ]
        _, gt, labels, valid = random_case(
            rng, b=b, a=1, n=9, num_classes=num_classes, spread=90.0
        )
        return anchors_levels, cls_levels, box_levels, gt, labels, valid

    def test_loss_levels_exactly_equal(self, rng):
        al, cl, bl, gt, labels, valid = self._case(rng)
        ref = retinanet_loss_levels(
            cl, bl, al, gt, labels, valid, num_classes=6,
            use_match_kernel=False,
        )
        got = retinanet_loss_levels(
            cl, bl, al, gt, labels, valid, num_classes=6,
            use_match_kernel=True, match_interpret=True,
        )
        for k in ref:
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))

    def test_loss_kernel_sharded_over_data_mesh(self, rng):
        """match_mesh routes the kernel through shard_map over 'data' —
        the >1-device production path (pallas_call has no SPMD rule)."""
        from jax.sharding import Mesh

        al, cl, bl, gt, labels, valid = self._case(rng)
        # batch 2 → a 2-device data mesh divides it
        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        ref = retinanet_loss_levels(
            cl, bl, al, gt, labels, valid, num_classes=6,
            use_match_kernel=False,
        )
        got = retinanet_loss_levels(
            cl, bl, al, gt, labels, valid, num_classes=6,
            use_match_kernel=True, match_interpret=True, match_mesh=mesh,
        )
        for k in ref:
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))

    def test_grads_flow_and_match(self, rng):
        al, cl, bl, gt, labels, valid = self._case(rng)

        def loss(levels, kernel):
            c, b = levels
            out = retinanet_loss_levels(
                c, b, al, gt, labels, valid, num_classes=6,
                use_match_kernel=kernel, match_interpret=kernel,
            )
            return out["classification_loss"] + out["regression_loss"]

        g_ref = jax.grad(lambda lv: loss(lv, False))((cl, bl))
        g_ker = jax.grad(lambda lv: loss(lv, True))((cl, bl))
        for r, k in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_ker)):
            np.testing.assert_array_equal(np.asarray(k), np.asarray(r))
        assert any(
            float(jnp.abs(l).max()) > 0
            for l in jax.tree_util.tree_leaves(g_ker)
        )
