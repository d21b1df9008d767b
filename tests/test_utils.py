"""Utils tests: load_obj registry remap, viz drawing, meters, seed."""

import numpy as np
import pytest

from pytorch_retinanet_tpu.utils import (
    MetricLogger,
    SmoothedValue,
    collate_fn,
    load_obj,
    seed_everything,
    visualize_boxes_and_labels_on_image_array,
)


class TestLoadObj:
    def test_albumentations_name_maps_to_native(self):
        from pytorch_retinanet_tpu.data.transforms import HorizontalFlip

        assert load_obj("albumentations.HorizontalFlip") is HorizontalFlip

    def test_torch_optim_name_maps_to_registry(self):
        fn = load_obj("torch.optim.SGD")
        assert callable(fn)

    def test_dotted_import_fallback(self):
        import json

        assert load_obj("json.dumps") is json.dumps

    def test_missing_attr_raises(self):
        with pytest.raises(AttributeError):
            load_obj("json.not_a_function")


class TestCollate:
    def test_ragged_tuple_transpose(self):
        batch = [("img0", {"t": 0}, 0), ("img1", {"t": 1}, 1)]
        images, targets, ids = collate_fn(batch)
        assert images == ("img0", "img1")
        assert ids == (0, 1)


class TestViz:
    def test_draws_boxes_on_uint8(self):
        img = np.zeros((64, 64, 3), np.uint8)
        out = visualize_boxes_and_labels_on_image_array(
            img,
            np.array([[10.0, 10, 50, 50]]),
            [1],
            [0.9],
            ["__background__", "cat"],
        )
        assert out.shape == (64, 64, 3)
        assert out.sum() > 0  # something got drawn

    def test_groundtruth_mode_without_scores(self):
        img = np.random.rand(32, 32, 3).astype(np.float32)
        out = visualize_boxes_and_labels_on_image_array(
            img, np.array([[2.0, 2, 20, 20]]), [1], None
        )
        assert out.dtype == np.uint8

    def test_low_scores_filtered(self):
        img = np.zeros((32, 32, 3), np.uint8)
        out = visualize_boxes_and_labels_on_image_array(
            img, np.array([[2.0, 2, 30, 30]]), [1], [0.1], min_score_thresh=0.5
        )
        np.testing.assert_array_equal(out, img)


class TestMeters:
    def test_smoothed_value_stats(self):
        v = SmoothedValue(window_size=3)
        for x in [1.0, 2.0, 3.0, 4.0]:
            v.update(x)
        assert v.median == 3.0
        assert v.global_avg == 2.5
        assert v.value == 4.0

    def test_metric_logger_accumulates(self):
        ml = MetricLogger()
        ml.update(loss=1.0)
        ml.update(loss=3.0)
        assert ml.loss.global_avg == 2.0
        assert "loss" in str(ml)


def test_seed_everything_deterministic():
    import random

    seed_everything(7)
    a = (random.random(), np.random.rand())
    seed_everything(7)
    b = (random.random(), np.random.rand())
    assert a == b


class TestFlops:
    """The analytic FLOPs are bench.py's speed-of-light denominator — pin
    them so a refactor can't silently move the headline MFU."""

    def test_r50_detector_flops_pinned(self):
        from pytorch_retinanet_tpu.utils.flops import detector_flops

        # 509.54 GFLOP/image at the 800px landscape bucket (docs/ROOFLINE.md's
        # 16305 GFLOP/batch32).
        assert detector_flops(800, 1344) == 509_539_817_472

    def test_trunk_depth_scaling(self):
        from pytorch_retinanet_tpu.utils.flops import resnet_trunk_flops

        r50 = resnet_trunk_flops(800, 1344, "resnet50")
        r101 = resnet_trunk_flops(800, 1344, "resnet101")
        r152 = resnet_trunk_flops(800, 1344, "resnet152")
        assert r50 < r101 < r152
        # R101 adds 17 layer3 blocks over R50 — ratio ~1.9 at this size.
        assert 1.8 < r101 / r50 < 2.0

    def test_orientation_symmetric(self):
        from pytorch_retinanet_tpu.utils.flops import detector_flops

        assert detector_flops(800, 1344) == detector_flops(1344, 800)
