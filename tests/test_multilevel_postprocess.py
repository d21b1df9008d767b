"""Multilevel postprocess parity vs the single-tensor reference path.

The per-level top-k path (ops.process_detections_multilevel) must produce the
same detections as process_detections when approx_top_k is disabled: a global
top-k over all levels equals a top-k over per-level top-k's.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_retinanet_tpu.ops import (
    generate_anchors,
    generate_anchors_per_level,
    process_detections,
    process_detections_multilevel,
)


@pytest.fixture
def level_setup(rng):
    image_size = (128, 160)
    anchors_levels = [jnp.asarray(a) for a in generate_anchors_per_level(image_size)]
    num_classes = 6
    cls_levels = [
        jnp.asarray(rng.normal(-4.0, 2.0, (a.shape[0], num_classes)).astype(np.float32))
        for a in anchors_levels
    ]
    box_levels = [
        jnp.asarray(rng.normal(0.0, 0.3, (a.shape[0], 4)).astype(np.float32))
        for a in anchors_levels
    ]
    return image_size, anchors_levels, cls_levels, box_levels


class TestMultilevelParity:
    def test_matches_single_tensor_path(self, level_setup):
        image_size, anchors_levels, cls_levels, box_levels = level_setup
        ml = process_detections_multilevel(
            cls_levels, box_levels, anchors_levels,
            jnp.asarray([float(image_size[0]), float(image_size[1])]),
            approx_top_k=False, use_pallas=False, pre_nms_top_k=300,
        )
        st = process_detections(
            jnp.concatenate(cls_levels), jnp.concatenate(box_levels),
            jnp.asarray(generate_anchors(image_size)),
            jnp.asarray([float(image_size[0]), float(image_size[1])]),
            use_pallas=False, pre_nms_top_k=300,
        )
        n_ml, n_st = int(ml.valid.sum()), int(st.valid.sum())
        assert n_ml == n_st
        # same detections (order may tie-break differently at equal scores)
        np.testing.assert_allclose(
            np.sort(np.asarray(ml.scores[:n_ml])),
            np.sort(np.asarray(st.scores[:n_st])), rtol=1e-6,
        )
        def det_set(d, n):
            return {
                (round(float(b[0]), 2), round(float(b[1]), 2),
                 round(float(b[2]), 2), round(float(b[3]), 2), int(l))
                for b, l in zip(np.asarray(d.boxes[:n]), np.asarray(d.labels[:n]))
            }
        assert det_set(ml, n_ml) == det_set(st, n_st)

    def test_recovers_planted_box(self, level_setup):
        image_size, anchors_levels, cls_levels, box_levels = level_setup
        # Spike one anchor on level 1, class 3
        cls_levels = [np.asarray(c) for c in cls_levels]
        cls_levels[1] = cls_levels[1].copy()
        cls_levels[1][:] = -20.0
        cls_levels[0] = np.full_like(cls_levels[0], -20.0)
        cls_levels[2] = np.full_like(cls_levels[2], -20.0)
        cls_levels[3] = np.full_like(cls_levels[3], -20.0)
        cls_levels[4] = np.full_like(cls_levels[4], -20.0)
        cls_levels[1][7, 2] = 9.0
        box_levels = [np.zeros_like(b) for b in box_levels]
        det = process_detections_multilevel(
            [jnp.asarray(c) for c in cls_levels],
            [jnp.asarray(b) for b in box_levels],
            anchors_levels,
            jnp.asarray([128.0, 160.0]),
            approx_top_k=False, use_pallas=False,
        )
        assert int(det.valid.sum()) == 1
        assert int(det.labels[0]) == 3  # class 2 + 1 background shift
        expected = np.clip(np.asarray(anchors_levels[1][7]), 0, None)
        got = np.asarray(det.boxes[0])
        # anchor decoded with zero deltas = clipped anchor
        np.testing.assert_allclose(
            got,
            np.clip(expected, [0, 0, 0, 0], [160, 128, 160, 128]),
            atol=1e-3,
        )

    def test_numpy_anchors_under_jit(self, level_setup):
        """Anchors arrive as lru_cached numpy constants (ops/anchors.py);
        indexing them with a traced sel_anchor must not raise
        TracerArrayConversionError (regression: nms.py:289, found by the
        production-scale parity run)."""
        import jax

        image_size, _, cls_levels, box_levels = level_setup
        np_anchors = generate_anchors_per_level(image_size)  # numpy, uncast
        assert all(isinstance(a, np.ndarray) for a in np_anchors)

        @jax.jit
        def run(cls_levels, box_levels, size):
            return process_detections_multilevel(
                cls_levels, box_levels, np_anchors, size,
                approx_top_k=False, use_pallas=False, pre_nms_top_k=300,
            )

        det = run(
            tuple(cls_levels), tuple(box_levels),
            jnp.asarray([float(image_size[0]), float(image_size[1])]),
        )
        ref = process_detections_multilevel(
            cls_levels, box_levels,
            [jnp.asarray(a) for a in np_anchors],
            jnp.asarray([float(image_size[0]), float(image_size[1])]),
            approx_top_k=False, use_pallas=False, pre_nms_top_k=300,
        )
        np.testing.assert_allclose(
            np.asarray(det.boxes), np.asarray(ref.boxes), rtol=1e-6
        )

    def test_approx_topk_keeps_planted_box(self, level_setup):
        image_size, anchors_levels, cls_levels, box_levels = level_setup
        cls_levels = [np.full(np.asarray(c).shape, -20.0, np.float32) for c in cls_levels]
        cls_levels[0][1234, 1] = 8.0
        det = process_detections_multilevel(
            [jnp.asarray(c) for c in cls_levels],
            [jnp.asarray(b) for b in box_levels],
            anchors_levels,
            jnp.asarray([128.0, 160.0]),
            approx_top_k=True, use_pallas=False,
        )
        assert int(det.valid.sum()) == 1
        assert int(det.labels[0]) == 2
