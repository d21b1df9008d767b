"""COCO dataset pipeline tests: target conversion, masks/keypoints, transforms."""

import numpy as np
import pytest

from pytorch_retinanet_tpu.data.coco import (
    COCOIndex,
    CocoDetectionDataset,
    _coco_target_to_arrays,
    _polygons_to_mask,
)
from pytorch_retinanet_tpu.data.coco_transforms import (
    Compose,
    RandomHorizontalFlip,
    TargetTransformAdapter,
    ToTensor,
)


class TestTargetConversion:
    def test_xywh_to_xyxy_and_clamp(self):
        anns = [
            {"bbox": [10, 20, 30, 40], "category_id": 3, "iscrowd": 0},
            {"bbox": [90, 90, 50, 50], "category_id": 1, "iscrowd": 0},  # clamps
        ]
        t = _coco_target_to_arrays(anns, 100, 100)
        np.testing.assert_allclose(t["boxes"][0], [10, 20, 40, 60])
        np.testing.assert_allclose(t["boxes"][1], [90, 90, 100, 100])

    def test_crowd_and_degenerate_dropped(self):
        anns = [
            {"bbox": [10, 10, 20, 20], "category_id": 1, "iscrowd": 1},
            {"bbox": [110, 10, 20, 20], "category_id": 2, "iscrowd": 0},  # off-image
            {"bbox": [5, 5, 10, 10], "category_id": 3, "iscrowd": 0},
        ]
        t = _coco_target_to_arrays(anns, 100, 100)
        assert t["labels"].tolist() == [3]

    def test_polygon_mask(self):
        # square polygon 10..30
        seg = [[10, 10, 30, 10, 30, 30, 10, 30]]
        mask = _polygons_to_mask(seg, 50, 50)
        assert mask[20, 20] == 1
        assert mask[5, 5] == 0
        assert mask.sum() >= 400  # ~21x21 filled

    def test_rle_mask(self):
        # 4x3 image, column-major runs: 5 zeros then 7 ones
        mask = _polygons_to_mask({"counts": [5, 7], "size": [4, 3]}, 4, 3)
        assert mask.sum() == 7
        assert mask.shape == (4, 3)
        # first 5 column-major entries are 0: col0 all 4 + col1 row0
        assert mask[0, 0] == 0 and mask[3, 0] == 0 and mask[0, 1] == 0
        assert mask[1, 1] == 1

    def test_masks_and_keypoints_returned(self):
        anns = [
            {
                "bbox": [10, 10, 20, 20],
                "category_id": 1,
                "iscrowd": 0,
                "segmentation": [[10, 10, 30, 10, 30, 30]],
                "keypoints": [15, 15, 2] * 17,
            }
        ]
        t = _coco_target_to_arrays(
            anns, 50, 50, return_masks=True, return_keypoints=True
        )
        assert t["masks"].shape == (1, 50, 50)
        assert t["keypoints"].shape == (1, 17, 3)


class TestCocoTransforms:
    def test_flip_boxes_and_keypoints(self):
        img = np.random.rand(20, 40, 3).astype(np.float32)
        target = {
            "boxes": np.array([[5.0, 2, 15, 12]], np.float32),
            "labels": np.array([1]),
            "keypoints": np.asarray([[[10, 5, 2]] * 17], np.float32),
        }
        flipped_img, flipped = RandomHorizontalFlip(prob=1.0)(img, target)
        np.testing.assert_allclose(flipped["boxes"][0], [25, 2, 35, 12])
        assert flipped["keypoints"][0, 0, 0] == 30
        np.testing.assert_allclose(flipped_img, img[:, ::-1])

    def test_compose_and_totensor(self):
        img = np.full((8, 8, 3), 128, np.uint8)
        t = Compose([ToTensor(), RandomHorizontalFlip(prob=0.0)])
        out, _ = t(img, {"boxes": np.zeros((0, 4), np.float32), "labels": np.zeros(0)})
        assert out.dtype == np.float32 and out.max() == pytest.approx(128 / 255)

    def test_adapter_bridges_interfaces(self):
        adapter = TargetTransformAdapter(Compose([ToTensor()]))
        img, boxes, labels = adapter(
            np.zeros((4, 4, 3), np.uint8),
            np.array([[0.0, 0, 2, 2]], np.float32),
            np.array([1]),
        )
        assert img.dtype == np.float32
        assert boxes.shape == (1, 4)


class TestCocoDatasetMasks:
    def test_dataset_returns_masks(self, tmp_path):
        import cv2, json

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        cv2.imwrite(str(img_dir / "a.png"), np.zeros((40, 60, 3), np.uint8))
        data = {
            "images": [{"id": 1, "height": 40, "width": 60, "file_name": "a.png"}],
            "annotations": [
                {
                    "id": 1, "image_id": 1, "category_id": 2,
                    "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0,
                    "segmentation": [[5, 5, 25, 5, 25, 25, 5, 25]],
                }
            ],
            "categories": [{"id": 2, "name": "x"}],
        }
        ds = CocoDetectionDataset(str(img_dir), data, return_masks=True)
        image, target, image_id = ds[0]
        assert target["masks"].shape == (1, 40, 60)
        assert target["masks"].sum() > 300
