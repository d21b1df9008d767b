"""COCO evaluator tests against hand-computed average precisions."""

import numpy as np
import pytest

from pytorch_retinanet_tpu.data.coco import COCOIndex
from pytorch_retinanet_tpu.eval import COCOeval, CocoEvaluator, bbox_iou_xywh


def make_gt(boxes_per_image, cat_id=1):
    """boxes_per_image: {image_id: [xywh, ...]}"""
    images, anns = [], []
    ann_id = 1
    for img_id, boxes in boxes_per_image.items():
        images.append({"id": img_id, "height": 500, "width": 500})
        for b in boxes:
            anns.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": cat_id,
                    "bbox": list(map(float, b)),
                    "area": float(b[2] * b[3]),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    return COCOIndex(
        {"images": images, "annotations": anns, "categories": [{"id": cat_id, "name": "x"}]}
    )


def run_eval(gt, dets):
    dt = gt.loadRes(dets)
    e = COCOeval(gt, dt, "bbox")
    e.evaluate()
    e.accumulate()
    e.summarize(verbose=False)
    return e.stats


class TestBboxIoU:
    def test_perfect_overlap(self):
        a = np.array([[0.0, 0.0, 10, 10]])
        assert bbox_iou_xywh(a, a, np.zeros(1))[0, 0] == pytest.approx(1.0)

    def test_half_overlap(self):
        d = np.array([[0.0, 0.0, 10, 10]])
        g = np.array([[5.0, 0.0, 10, 10]])
        # inter 50, union 150
        assert bbox_iou_xywh(d, g, np.zeros(1))[0, 0] == pytest.approx(1 / 3)

    def test_crowd_divides_by_dt_area(self):
        d = np.array([[0.0, 0.0, 10, 10]])
        g = np.array([[0.0, 0.0, 100, 100]])
        assert bbox_iou_xywh(d, g, np.ones(1))[0, 0] == pytest.approx(1.0)


class TestCOCOeval:
    def test_perfect_detection_ap_1(self):
        gt = make_gt({1: [[10, 10, 50, 50]]})
        stats = run_eval(
            gt, [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50], "score": 0.9}]
        )
        assert stats[0] == pytest.approx(1.0)  # AP@[.5:.95]
        assert stats[1] == pytest.approx(1.0)  # AP50
        assert stats[8] == pytest.approx(1.0)  # AR@100

    def test_miss_gives_zero(self):
        gt = make_gt({1: [[10, 10, 50, 50]]})
        stats = run_eval(
            gt, [{"image_id": 1, "category_id": 1, "bbox": [300, 300, 50, 50], "score": 0.9}]
        )
        assert stats[0] == pytest.approx(0.0)

    def test_iou_0p6_matches_only_low_thresholds(self):
        # dt shifted so IoU = 0.6: matches at thresholds {0.5, 0.55, 0.6}, 3/10.
        # 50x50 gt, dt shifted by 12.5 in x: inter=37.5*50, union=2*2500-1875
        gt = make_gt({1: [[0, 0, 50, 50]]})
        stats = run_eval(
            gt,
            [{"image_id": 1, "category_id": 1, "bbox": [12.5, 0, 50, 50], "score": 0.9}],
        )
        iou = (37.5 * 50) / (2 * 2500 - 37.5 * 50)
        n_match = int(np.sum(np.linspace(0.5, 0.95, 10) <= iou + 1e-9))
        assert stats[0] == pytest.approx(n_match / 10.0)

    def test_fp_before_tp_halves_precision(self):
        # higher-scored FP then TP: precision at recall 1.0 is 1/2 everywhere
        gt = make_gt({1: [[0, 0, 50, 50]]})
        stats = run_eval(
            gt,
            [
                {"image_id": 1, "category_id": 1, "bbox": [300, 300, 50, 50], "score": 0.95},
                {"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50], "score": 0.9},
            ],
        )
        assert stats[1] == pytest.approx(0.5)  # AP50

    def test_crowd_gt_is_ignored_not_counted(self):
        gt = make_gt({1: [[0, 0, 50, 50]]})
        gt.dataset["annotations"].append(
            {
                "id": 99,
                "image_id": 1,
                "category_id": 1,
                "bbox": [200.0, 200.0, 80.0, 80.0],
                "area": 6400.0,
                "iscrowd": 1,
            }
        )
        gt.create_index()
        # One TP on the real GT; a second detection inside the crowd region is
        # matched-to-crowd => ignored, not an FP.
        stats = run_eval(
            gt,
            [
                {"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50], "score": 0.9},
                {"image_id": 1, "category_id": 1, "bbox": [210, 210, 60, 60], "score": 0.8},
            ],
        )
        assert stats[1] == pytest.approx(1.0)

    def test_area_ranges_route_small_vs_large(self):
        # 20x20 box is 'small' (<32^2); 200x200 is 'large'
        gt = make_gt({1: [[0, 0, 20, 20], [100, 100, 200, 200]]})
        stats = run_eval(
            gt,
            [
                {"image_id": 1, "category_id": 1, "bbox": [0, 0, 20, 20], "score": 0.9},
                {"image_id": 1, "category_id": 1, "bbox": [100, 100, 200, 200], "score": 0.8},
            ],
        )
        assert stats[3] == pytest.approx(1.0)  # AP small
        assert stats[5] == pytest.approx(1.0)  # AP large
        assert stats[4] == pytest.approx(-1.0)  # AP medium: no GT → -1

    def test_maxdets_1_limits_recall(self):
        gt = make_gt({1: [[0, 0, 50, 50], [200, 200, 50, 50]]})
        dets = [
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50], "score": 0.9},
            {"image_id": 1, "category_id": 1, "bbox": [200, 200, 50, 50], "score": 0.8},
        ]
        stats = run_eval(gt, dets)
        assert stats[6] == pytest.approx(0.5)  # AR@1: only top-1 counted
        assert stats[8] == pytest.approx(1.0)  # AR@100


class TestCocoEvaluator:
    def test_update_accumulate_summarize(self):
        gt = make_gt({1: [[10, 10, 50, 50]], 2: [[20, 20, 40, 40]]})
        ev = CocoEvaluator(gt, ["bbox"])
        ev.update(
            {
                1: {
                    "boxes": np.array([[10.0, 10, 60, 60]]),  # xyxy
                    "scores": np.array([0.9]),
                    "labels": np.array([1]),
                }
            }
        )
        ev.update(
            {
                2: {
                    "boxes": np.array([[20.0, 20, 60, 60]]),
                    "scores": np.array([0.8]),
                    "labels": np.array([1]),
                }
            }
        )
        ev.accumulate()
        stats = ev.summarize(verbose=False)["bbox"]
        assert stats[0] == pytest.approx(1.0)
        assert stats[8] == pytest.approx(1.0)

    def test_two_shard_merge_equals_single_shard(self):
        """Simulated 2-process eval: each shard sees half the images; after
        synchronize_between_processes with a fake 2-shard gather, the merged
        AP must equal the single-evaluator AP (reference multi-rank protocol,
        coco_eval.py:44-49/164-183)."""
        gt = make_gt({1: [[10, 10, 50, 50]], 2: [[20, 20, 40, 40]],
                      3: [[5, 5, 30, 30]], 4: [[100, 100, 80, 80]]})
        preds = {
            1: {"boxes": np.array([[10.0, 10, 60, 60]]),
                "scores": np.array([0.9]), "labels": np.array([1])},
            2: {"boxes": np.array([[20.0, 20, 60, 60]]),
                "scores": np.array([0.8]), "labels": np.array([1])},
            3: {"boxes": np.array([[200.0, 200, 250, 250]]),  # miss
                "scores": np.array([0.7]), "labels": np.array([1])},
            4: {"boxes": np.array([[100.0, 100, 180, 180]]),
                "scores": np.array([0.6]), "labels": np.array([1])},
        }
        # single-process reference
        ev_all = CocoEvaluator(gt, ["bbox"])
        ev_all.update(preds)
        ev_all.accumulate()
        stats_all = ev_all.summarize(verbose=False)["bbox"]

        # two shards merged through a fake gather
        shard0 = CocoEvaluator(gt, ["bbox"])
        shard1 = CocoEvaluator(gt, ["bbox"])
        shard0.update({k: preds[k] for k in (1, 3)})
        shard1.update({k: preds[k] for k in (2, 4)})

        # fake 2-rank gather: first call merges img_ids, second merges results
        calls = {"n": 0}

        def fake_gather(obj):
            calls["n"] += 1
            if calls["n"] == 1:  # img_ids are gathered first
                return [shard0.img_ids, shard1.img_ids]
            return [shard0.results["bbox"], shard1.results["bbox"]]

        shard0.synchronize_between_processes(fake_gather)
        shard0.accumulate()
        stats_merged = shard0.summarize(verbose=False)["bbox"]
        np.testing.assert_allclose(stats_merged, stats_all)
        assert 0.0 < stats_merged[0] < 1.0  # nondegenerate (one miss)

    def test_synchronize_defaults_to_identity_single_process(self):
        """No-arg synchronize_between_processes must be safe: it defaults to
        parallel.all_gather_objects, the identity in a single process — a
        caller that forgets the gather fn can never silently drop shards."""
        gt = make_gt({1: [[10, 10, 50, 50]]})
        ev = CocoEvaluator(gt, ["bbox"])
        ev.update({1: {"boxes": np.array([[10.0, 10, 60, 60]]),
                       "scores": np.array([0.9]), "labels": np.array([1])}})
        before = list(ev.results["bbox"])
        ev.synchronize_between_processes()
        assert ev.results["bbox"] == before and ev.img_ids == [1]
        ev.accumulate()
        assert ev.summarize(verbose=False)["bbox"][0] > 0

    def test_area_boundary_closed_like_pycocotools(self):
        """GT with area exactly 32^2 must count as BOTH 'small' and 'medium'
        (pycocotools treats area ranges as closed intervals)."""
        side = 32.0  # area = 1024 = 32^2 — on the small/medium boundary
        gt = make_gt({1: [[10, 10, side, side]]})
        stats = run_eval(
            gt,
            [{"image_id": 1, "category_id": 1,
              "bbox": [10.0, 10, side, side], "score": 0.9}],
        )
        assert stats[3] == pytest.approx(1.0)  # AP-small
        assert stats[4] == pytest.approx(1.0)  # AP-medium (closed bound)

    def test_empty_predictions_ok(self):
        gt = make_gt({1: [[10, 10, 50, 50]]})
        ev = CocoEvaluator(gt, ["bbox"])
        ev.update({1: {"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "labels": np.zeros(0, int)}})
        ev.accumulate()
        stats = ev.summarize(verbose=False)["bbox"]
        assert stats[0] == pytest.approx(0.0)
