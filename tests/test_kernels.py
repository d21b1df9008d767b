"""Pallas kernel parity tests (interpreter mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from pytorch_retinanet_tpu.kernels import pallas_nms_keep_mask
from pytorch_retinanet_tpu.ops import nms_keep_mask


def random_sorted_candidates(rng, n, spread=200.0):
    ctr = rng.uniform(0, spread, (n, 2))
    wh = rng.uniform(5, 80, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.uniform(size=n))[::-1].astype(np.float32).copy()
    return boxes, scores


class TestPallasNMS:
    def test_parity_with_xla_fixpoint(self, rng):
        with pltpu.force_tpu_interpret_mode():
            for trial in range(5):
                boxes, scores = random_sorted_candidates(rng, 200)
                valid = rng.uniform(size=200) > 0.1
                ours = np.asarray(
                    pallas_nms_keep_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.5)
                )
                ref = np.asarray(
                    nms_keep_mask(
                        jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                        jnp.asarray(valid),
                    )
                )
                np.testing.assert_array_equal(ours, ref, err_msg=f"trial {trial}")

    def test_all_invalid_keeps_nothing(self, rng):
        with pltpu.force_tpu_interpret_mode():
            boxes, _ = random_sorted_candidates(rng, 64)
            keep = pallas_nms_keep_mask(
                jnp.asarray(boxes), jnp.zeros(64, bool), 0.5
            )
            assert not bool(np.asarray(keep).any())

    def test_vmapped_batch_parity(self, rng):
        """The batched inference path vmaps the kernel — per-image results
        must match the per-image XLA fixpoint exactly."""
        import jax

        with pltpu.force_tpu_interpret_mode():
            B, K = 3, 128
            boxes = np.stack([random_sorted_candidates(rng, K)[0] for _ in range(B)])
            scores = np.stack(
                [np.sort(rng.uniform(size=K))[::-1].astype(np.float32) for _ in range(B)]
            )
            valid = rng.uniform(size=(B, K)) > 0.2
            batched = jax.vmap(lambda b, v: pallas_nms_keep_mask(b, v, 0.5))(
                jnp.asarray(boxes), jnp.asarray(valid)
            )
            for i in range(B):
                ref = nms_keep_mask(
                    jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.5,
                    jnp.asarray(valid[i]),
                )
                np.testing.assert_array_equal(
                    np.asarray(batched[i]), np.asarray(ref), err_msg=f"image {i}"
                )

    def test_full_multilevel_batch_with_pallas(self, rng):
        """process_detections_multilevel_batch with use_pallas=True (interpret)
        equals the XLA path — covers the exact program bench.py runs."""
        from pytorch_retinanet_tpu.ops import (
            generate_anchors_per_level,
            process_detections_multilevel_batch,
        )

        size = (64, 96)
        anchors_l = [jnp.asarray(a) for a in generate_anchors_per_level(size)]
        B, C = 2, 4
        cls_l = [
            jnp.asarray(rng.normal(-4, 2, (B, a.shape[0], C)).astype(np.float32))
            for a in anchors_l
        ]
        box_l = [
            jnp.asarray(rng.normal(0, 0.2, (B, a.shape[0], 4)).astype(np.float32))
            for a in anchors_l
        ]
        sizes = jnp.asarray([[64.0, 96.0]] * B)
        with pltpu.force_tpu_interpret_mode():
            det_p = process_detections_multilevel_batch(
                cls_l, box_l, anchors_l, sizes, use_pallas=True, approx_top_k=False,
            )
        det_x = process_detections_multilevel_batch(
            cls_l, box_l, anchors_l, sizes, use_pallas=False, approx_top_k=False,
        )
        np.testing.assert_array_equal(np.asarray(det_p.valid), np.asarray(det_x.valid))
        np.testing.assert_allclose(
            np.asarray(det_p.scores), np.asarray(det_x.scores), rtol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(det_p.labels), np.asarray(det_x.labels))

    def test_identical_boxes_keep_first(self, rng):
        with pltpu.force_tpu_interpret_mode():
            boxes = np.tile(np.array([[10.0, 10, 50, 50]], np.float32), (8, 1))
            keep = np.asarray(
                pallas_nms_keep_mask(jnp.asarray(boxes), jnp.ones(8, bool), 0.5)
            )
            assert keep.tolist() == [True] + [False] * 7
