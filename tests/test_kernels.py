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

    def test_identical_boxes_keep_first(self, rng):
        with pltpu.force_tpu_interpret_mode():
            boxes = np.tile(np.array([[10.0, 10, 50, 50]], np.float32), (8, 1))
            keep = np.asarray(
                pallas_nms_keep_mask(jnp.asarray(boxes), jnp.ones(8, bool), 0.5)
            )
            assert keep.tolist() == [True] + [False] * 7
