"""RLE mask codec + segm/keypoints evaluation tests."""

import numpy as np
import pytest

from pytorch_retinanet_tpu.data import masks as M
from pytorch_retinanet_tpu.data.coco import COCOIndex
from pytorch_retinanet_tpu.eval import COCOeval, CocoEvaluator


def random_mask(h, w, seed):
    rng = np.random.default_rng(seed)
    m = np.zeros((h, w), np.uint8)
    for _ in range(rng.integers(1, 4)):
        y0, x0 = rng.integers(0, h // 2), rng.integers(0, w // 2)
        y1, x1 = y0 + rng.integers(1, h - y0), x0 + rng.integers(1, w - x0)
        m[y0:y1, x0:x1] = 1
    return m


class TestRleCodec:
    def test_runs_are_column_major(self):
        # 2x3 mask with a single foreground pixel at (row=1, col=0):
        # column-major order = [m[0,0], m[1,0], m[0,1], m[1,1], m[0,2], m[1,2]]
        m = np.zeros((2, 3), np.uint8)
        m[1, 0] = 1
        from pytorch_retinanet_tpu.native import rle_encode_mask

        runs = rle_encode_mask(m)
        assert runs.tolist() == [1, 1, 4]

    def test_encode_decode_roundtrip(self):
        for seed in range(6):
            m = random_mask(17, 23, seed)
            rle = M.encode(m)
            assert isinstance(rle["counts"], str)
            np.testing.assert_array_equal(M.decode(rle), m)

    def test_area_matches_pixels(self):
        m = random_mask(20, 20, 3)
        assert M.area(M.encode(m)) == int(m.sum())

    def test_to_bbox(self):
        m = np.zeros((10, 12), np.uint8)
        m[2:5, 3:9] = 1
        np.testing.assert_array_equal(M.to_bbox(M.encode(m)), [3, 2, 6, 3])

    def test_uncompressed_rle_decodes(self):
        m = random_mask(9, 7, 1)
        from pytorch_retinanet_tpu.native import rle_encode_mask

        runs = rle_encode_mask(m)
        dec = M.decode({"size": [9, 7], "counts": runs.tolist()})
        np.testing.assert_array_equal(dec, m)

    def test_string_codec_roundtrip_large_runs(self):
        # values that need multiple 5-bit chunks + negative deltas
        runs = [0, 100000, 3, 99990, 1, 5]
        s = M.runs_to_string(runs)
        np.testing.assert_array_equal(M.string_to_runs(s), runs)

    def test_segmentation_to_mask_all_three_shapes(self):
        m = np.zeros((8, 8), np.uint8)
        m[2:6, 2:6] = 1
        # polygons
        poly = [[2, 2, 5, 2, 5, 5, 2, 5]]
        pm = M.segmentation_to_mask(poly, 8, 8)
        assert pm[3, 3] == 1 and pm[0, 0] == 0
        # compressed string
        np.testing.assert_array_equal(
            M.segmentation_to_mask(M.encode(m), 8, 8), m
        )
        # uncompressed list
        from pytorch_retinanet_tpu.native import rle_encode_mask

        np.testing.assert_array_equal(
            M.segmentation_to_mask(
                {"size": [8, 8], "counts": rle_encode_mask(m).tolist()}, 8, 8
            ),
            m,
        )

    def test_crowd_rle_in_coco_target(self):
        """Compressed-string RLE in a COCO segmentation must rasterize (the
        round-1 behavior silently yielded an empty mask)."""
        from pytorch_retinanet_tpu.data.coco import _coco_target_to_arrays

        m = np.zeros((10, 10), np.uint8)
        m[1:5, 1:5] = 1
        ann = {"bbox": [1, 1, 4, 4], "category_id": 1, "iscrowd": 0,
               "segmentation": M.encode(m)}
        out = _coco_target_to_arrays([ann], 10, 10, return_masks=True)
        assert out["masks"].shape == (1, 10, 10)
        assert out["masks"][0].sum() == 16


class TestMaskIoU:
    def test_identity_and_disjoint(self):
        a = np.zeros((1, 6, 6), np.uint8); a[0, :3] = 1
        b = np.zeros((2, 6, 6), np.uint8)
        b[0, :3] = 1          # identical
        b[1, 3:] = 1          # disjoint
        ious = M.iou(a, b, [0, 0])
        assert ious[0, 0] == pytest.approx(1.0)
        assert ious[0, 1] == pytest.approx(0.0)

    def test_crowd_semantics(self):
        d = np.zeros((1, 4, 4), np.uint8); d[0, 0, :2] = 1     # area 2
        g = np.ones((1, 4, 4), np.uint8)                        # covers all
        assert M.iou(d, g, [1])[0, 0] == pytest.approx(1.0)     # inter/dt_area
        assert M.iou(d, g, [0])[0, 0] == pytest.approx(2 / 16)


def make_segm_gt():
    h = w = 32
    gt_mask = np.zeros((h, w), np.uint8)
    gt_mask[4:16, 4:16] = 1
    return h, w, gt_mask, COCOIndex({
        "images": [{"id": 1, "height": h, "width": w}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "bbox": [4.0, 4.0, 12.0, 12.0], "area": float(gt_mask.sum()),
            "iscrowd": 0, "segmentation": M.encode(gt_mask),
        }],
        "categories": [{"id": 1, "name": "x"}],
    })


class TestSegmEval:
    def test_perfect_mask_ap_1(self):
        h, w, gt_mask, gt = make_segm_gt()
        ev = CocoEvaluator(gt, ["segm"])
        ev.update({1: {"boxes": np.array([[4.0, 4, 16, 16]]),
                       "scores": np.array([0.9]), "labels": np.array([1]),
                       "masks": gt_mask[None]}})
        ev.accumulate()
        stats = ev.summarize(verbose=False)["segm"]
        assert stats[0] == pytest.approx(1.0)

    def test_half_overlap_mask_matches_hand_ap(self):
        """Detection mask covering the top half of the GT: IoU = 0.5 ⇒
        matches at thresholds .50 only ⇒ AP = 1/10 of thresholds... computed:
        TP at t=0.5 only → AP = mean over T of (1 at t≤0.5) = 0.1... with a
        single GT and detection, precision=recall=1 at t=0.5, 0 elsewhere."""
        h, w, gt_mask, gt = make_segm_gt()
        half = gt_mask.copy()
        half[10:] = 0  # keep rows 4..9 of 4..15 → 6/12 rows = IoU 0.5
        ev = CocoEvaluator(gt, ["segm"])
        ev.update({1: {"boxes": np.array([[4.0, 4, 16, 10]]),
                       "scores": np.array([0.9]), "labels": np.array([1]),
                       "masks": half[None]}})
        ev.accumulate()
        stats = ev.summarize(verbose=False)["segm"]
        assert stats[0] == pytest.approx(0.1)   # only the 0.50 threshold
        assert stats[1] == pytest.approx(1.0)   # AP@.50

    def test_bbox_and_segm_together(self):
        h, w, gt_mask, gt = make_segm_gt()
        ev = CocoEvaluator(gt, ["bbox", "segm"])
        ev.update({1: {"boxes": np.array([[4.0, 4, 16, 16]]),
                       "scores": np.array([0.9]), "labels": np.array([1]),
                       "masks": gt_mask[None]}})
        ev.accumulate()
        stats = ev.summarize(verbose=False)  # per-iou-type dict
        assert stats["bbox"][0] == pytest.approx(1.0)
        assert stats["segm"][0] == pytest.approx(1.0)


def make_kp_gt(kps, area=3600.0):
    """One person-category GT with the given [K,3] keypoints."""
    flat = [float(v) for trip in kps for v in trip]
    return COCOIndex({
        "images": [{"id": 1, "height": 200, "width": 200}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "bbox": [40.0, 40.0, 60.0, 60.0], "area": area, "iscrowd": 0,
            "keypoints": flat,
            "num_keypoints": int(sum(1 for t in kps if t[2] > 0)),
        }],
        "categories": [{"id": 1, "name": "person"}],
    })


class TestKeypointEval:
    def _kps(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(50, 90, size=(17, 2))
        return [[float(x), float(y), 2] for x, y in pts]

    def test_perfect_keypoints_ap_1(self):
        kps = self._kps()
        gt = make_kp_gt(kps)
        ev = CocoEvaluator(gt, ["keypoints"])
        ev.update({1: {"boxes": np.array([[40.0, 40, 100, 100]]),
                       "scores": np.array([0.9]), "labels": np.array([1]),
                       "keypoints": np.asarray(kps)[None]}})
        ev.accumulate()
        stats = ev.summarize(verbose=False)["keypoints"]
        assert len(stats) == 10
        assert stats[0] == pytest.approx(1.0)

    def test_far_keypoints_ap_0(self):
        kps = self._kps()
        gt = make_kp_gt(kps)
        bad = np.asarray(kps).copy()
        bad[:, :2] += 150.0  # OKS ~ 0
        ev = CocoEvaluator(gt, ["keypoints"])
        ev.update({1: {"boxes": np.array([[40.0, 40, 100, 100]]),
                       "scores": np.array([0.9]), "labels": np.array([1]),
                       "keypoints": bad[None]}})
        ev.accumulate()
        stats = ev.summarize(verbose=False)["keypoints"]
        assert stats[0] == pytest.approx(0.0)

    def test_oks_identity_is_1(self):
        kps = self._kps()
        gt_ann = {"keypoints": [v for t in kps for v in t],
                  "bbox": [40.0, 40, 60, 60], "area": 3600.0}
        dt_ann = {"keypoints": [v for t in kps for v in t], "score": 0.9}
        e = COCOeval(make_kp_gt(kps), COCOIndex(), "keypoints")
        oks = e.computeOks([dt_ann], [gt_ann])
        assert oks[0, 0] == pytest.approx(1.0)

    def test_unknown_ioutype_still_raises(self):
        with pytest.raises(NotImplementedError):
            COCOeval(make_kp_gt(self._kps()), COCOIndex(), "masks")
