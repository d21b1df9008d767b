"""Native C++ ops: build, correctness, and parity with python/jnp paths."""

import numpy as np
import pytest

from pytorch_retinanet_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build native lib"
)


def random_boxes(rng, n, spread=200.0):
    ctr = rng.uniform(0, spread, (n, 2))
    wh = rng.uniform(5, 80, (n, 2))
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)


class TestNativeNMS:
    def test_matches_python_greedy(self, rng):
        for _ in range(20):
            boxes = random_boxes(rng, 150)
            keep_native = native.nms_xyxy(boxes, 0.5)
            # pure-python oracle
            keep_py = np.ones(len(boxes), bool)
            for i in range(len(boxes)):
                if not keep_py[i]:
                    continue
                ious = native.box_iou_xyxy(boxes[i : i + 1], boxes[i + 1 :])[0]
                keep_py[i + 1 :] &= ~(ious > 0.5)
            np.testing.assert_array_equal(keep_native, keep_py)

    def test_matches_device_nms(self, rng):
        import jax.numpy as jnp

        from pytorch_retinanet_tpu.ops import nms_keep_mask

        boxes = random_boxes(rng, 100)
        scores = np.sort(rng.uniform(size=100))[::-1].copy()
        keep_native = native.nms_xyxy(boxes, 0.5)
        keep_device = np.asarray(
            nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        )
        np.testing.assert_array_equal(keep_native, keep_device)


class TestNativeIoU:
    def test_xyxy_parity_with_ops(self, rng):
        import jax.numpy as jnp

        from pytorch_retinanet_tpu.ops import box_iou

        a, b = random_boxes(rng, 13), random_boxes(rng, 7)
        np.testing.assert_allclose(
            native.box_iou_xyxy(a, b),
            np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b))),
            rtol=1e-5, atol=1e-6,
        )

    def test_coco_xywh_parity_with_numpy(self, rng):
        from pytorch_retinanet_tpu.eval import bbox_iou_xywh

        dt = rng.uniform(0, 100, (9, 4)) + 1
        gt = rng.uniform(0, 100, (5, 4)) + 1
        crowd = (rng.uniform(size=5) > 0.5).astype(np.int32)
        np.testing.assert_allclose(
            native.coco_iou_xywh(dt, gt, crowd),
            bbox_iou_xywh(dt, gt, crowd),
            rtol=1e-12,
        )


class TestNativeCocoMatch:
    def _python_match(self, ious, gt_ig, crowd, thrs):
        """The evaluator's reference python loop (pycocotools semantics)."""
        D, G = ious.shape
        T = len(thrs)
        dtm = np.zeros((T, D), np.int32)
        gtm = np.zeros((T, G), np.int32)
        dt_ig = np.zeros((T, D), np.uint8)
        for t in range(T):
            for d in range(D):
                iou = min(thrs[t], 1 - 1e-10)
                m = -1
                for g in range(G):
                    if gtm[t, g] > 0 and not crowd[g]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[g] == 1:
                        break
                    if ious[d, g] < iou:
                        continue
                    iou = ious[d, g]
                    m = g
                if m == -1:
                    continue
                dt_ig[t, d] = 1 if gt_ig[m] else 0
                dtm[t, d] = m + 1
                gtm[t, m] = d + 1
        return dtm, gtm, dt_ig

    def test_parity_random(self, rng):
        thrs = np.linspace(0.5, 0.95, 10)
        for _ in range(30):
            D, G = rng.integers(1, 12), rng.integers(1, 8)
            ious = rng.uniform(0, 1, (D, G))
            gt_ig = np.sort(rng.uniform(size=G) > 0.7).astype(np.float64)  # sorted: real first
            crowd = np.where(gt_ig > 0, rng.integers(0, 2, G), 0).astype(np.int32)
            ref = self._python_match(ious, gt_ig, crowd, thrs)
            out = native.coco_match(ious, gt_ig, crowd, thrs)
            for a, b in zip(out, ref):
                np.testing.assert_array_equal(a, b)


class TestEvaluatorUsesNative:
    def test_stats_identical_with_and_without_native(self, rng, monkeypatch):
        from pytorch_retinanet_tpu.data.coco import COCOIndex
        from pytorch_retinanet_tpu.eval import COCOeval
        import pytorch_retinanet_tpu.native as nat

        images, anns = [], []
        ann_id = 1
        for img_id in range(4):
            images.append({"id": img_id, "height": 300, "width": 300})
            for _ in range(int(rng.integers(1, 5))):
                x, y = rng.uniform(0, 200, 2)
                w, h = rng.uniform(10, 80, 2)
                anns.append(
                    {"id": ann_id, "image_id": img_id, "category_id": int(rng.integers(1, 3)),
                     "bbox": [x, y, w, h], "area": w * h,
                     "iscrowd": int(rng.uniform() > 0.9)}
                )
                ann_id += 1
        gt = COCOIndex({"images": images, "annotations": anns,
                        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]})
        dets = []
        for img_id in range(4):
            for _ in range(6):
                x, y = rng.uniform(0, 220, 2)
                w, h = rng.uniform(10, 80, 2)
                dets.append({"image_id": img_id, "category_id": int(rng.integers(1, 3)),
                             "bbox": [x, y, w, h], "score": float(rng.uniform())})

        def run():
            e = COCOeval(gt, gt.loadRes(dets), "bbox")
            e.evaluate(); e.accumulate(); e.summarize(verbose=False)
            return e.stats.copy()

        stats_native = run()
        monkeypatch.setattr(nat, "coco_match", lambda *a, **k: None)
        stats_python = run()
        np.testing.assert_allclose(stats_native, stats_python, rtol=1e-12)
