"""Data layer tests: transforms, pascal/csv ingestion, COCO index, loader."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from pytorch_retinanet_tpu.data import (
    COCOIndex,
    CocoDetectionDataset,
    Compose,
    DetectionLoader,
    HorizontalFlip,
    PascalDataset,
    RandomBrightnessContrast,
    ToFloat,
    build_transforms,
    convert_annotations_to_df,
    convert_to_coco_api,
    generate_pascal_category_names,
    pad_targets,
)


@pytest.fixture
def voc_dir(tmp_path):
    """Two VOC XML files + matching images."""
    import cv2

    ann = tmp_path / "ann"
    img = tmp_path / "img"
    ann.mkdir()
    img.mkdir()
    xml = """<annotation>
      <filename>{name}</filename>
      <size><width>80</width><height>60</height><depth>3</depth></size>
      <object><name>{cls1}</name>
        <bndbox><xmin>10</xmin><ymin>10</ymin><xmax>30</xmax><ymax>30</ymax></bndbox>
      </object>
      <object><name>{cls2}</name>
        <bndbox><xmin>40</xmin><ymin>20</ymin><xmax>70</xmax><ymax>50</ymax></bndbox>
      </object>
    </annotation>"""
    for i, (c1, c2) in enumerate([("dog", "cat"), ("cat", "bird")]):
        (ann / f"{i}.xml").write_text(xml.format(name=f"{i}.png", cls1=c1, cls2=c2))
        cv2.imwrite(str(img / f"{i}.png"), np.full((60, 80, 3), 128, np.uint8))
    return str(ann), str(img)


class TestTransforms:
    def test_hflip_flips_boxes(self):
        img = np.zeros((10, 20, 3), np.float32)
        boxes = np.array([[2.0, 1.0, 6.0, 5.0]], np.float32)
        labels = np.array([1])
        t = HorizontalFlip(p=1.0)
        _, fb, _ = t(img, boxes, labels)
        assert fb.tolist() == [[14.0, 1.0, 18.0, 5.0]]

    def test_hflip_involution(self):
        img = np.random.rand(10, 20, 3).astype(np.float32)
        boxes = np.array([[2.0, 1.0, 6.0, 5.0]], np.float32)
        t = HorizontalFlip(p=1.0)
        i2, b2, _ = t(*t(img, boxes, np.array([1])))
        np.testing.assert_allclose(i2, img)
        np.testing.assert_allclose(b2, boxes)

    def test_tofloat_scales_uint8(self):
        img = np.full((4, 4, 3), 255, np.uint8)
        out, _, _ = ToFloat()(img, np.zeros((0, 4), np.float32), np.zeros(0))
        assert out.dtype == np.float32 and out.max() == pytest.approx(1.0)

    def test_brightness_contrast_stays_in_range(self):
        img = np.random.rand(8, 8, 3).astype(np.float32)
        out, _, _ = RandomBrightnessContrast(0.5, 0.5, p=1.0)(
            img, np.zeros((0, 4), np.float32), np.zeros(0)
        )
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_build_transforms_reference_config_shape(self):
        t = build_transforms(
            [{"class_name": "albumentations.HorizontalFlip", "params": {"p": 0.5}}]
        )
        assert isinstance(t, Compose)
        assert any(isinstance(x, HorizontalFlip) for x in t.transforms)

    def test_build_transforms_unknown_raises(self):
        with pytest.raises(KeyError):
            build_transforms([{"class_name": "albumentations.CLAHE", "params": {}}])


class TestPascal:
    def test_xml_scrape_schema_and_labels(self, voc_dir):
        ann, img = voc_dir
        df = convert_annotations_to_df(ann, img)
        assert set(df.columns) >= {
            "filename", "width", "height", "class", "xmin", "ymin", "xmax", "ymax", "labels",
        }
        assert len(df) == 4
        # labels: sorted classes bird<cat<dog → 1,2,3 (0 = background)
        lut = dict(zip(df["class"], df["labels"]))
        assert lut == {"bird": 1, "cat": 2, "dog": 3}

    def test_category_names_with_background(self, voc_dir):
        ann, img = voc_dir
        df = convert_annotations_to_df(ann, img)
        names = generate_pascal_category_names(df)
        assert names[0] == "__background__"
        assert names[1] == "bird" and names[3] == "dog"

    def test_dataset_getitem(self, voc_dir):
        ann, img = voc_dir
        df = convert_annotations_to_df(ann, img)
        ds = PascalDataset(df)
        image, target, idx = ds[0]
        assert image.shape == (60, 80, 3) and image.dtype == np.float32
        assert target["boxes"].shape == (2, 4)
        assert len(ds) == 2


class TestCOCOIndex:
    def test_roundtrip_and_loadres(self, tmp_path):
        data = {
            "images": [{"id": 7, "height": 50, "width": 60, "file_name": "7.png"}],
            "annotations": [
                {"id": 1, "image_id": 7, "category_id": 3,
                 "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0}
            ],
            "categories": [{"id": 3, "name": "cat"}],
        }
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(data))
        coco = COCOIndex(str(p))
        assert coco.getImgIds() == [7]
        assert coco.getAnnIds([7]) == [1]
        res = coco.loadRes(
            [{"image_id": 7, "category_id": 3, "bbox": [5, 5, 20, 20], "score": 0.5}]
        )
        assert len(res.anns) == 1 and res.anns[1]["area"] == 400

    def test_convert_to_coco_api(self, voc_dir):
        ann, img = voc_dir
        from pytorch_retinanet_tpu.data import convert_annotations_to_df

        ds = PascalDataset(convert_annotations_to_df(ann, img))
        api = convert_to_coco_api(ds)
        assert len(api.imgs) == 2
        assert len(api.anns) == 4
        # bbox stored as xywh
        first = next(iter(api.anns.values()))
        assert first["bbox"][2] == pytest.approx(20.0)


class TestLoader:
    def test_pad_targets(self):
        b, l, v = pad_targets(np.ones((3, 4), np.float32), np.ones(3, np.int64), 5)
        assert b.shape == (5, 4) and v.sum() == 3 and l[3:].sum() == 0

    def test_fixed_shape_batches(self, voc_dir):
        ann, img = voc_dir
        df = convert_annotations_to_df(ann, img)
        ds = PascalDataset(df)
        loader = DetectionLoader(
            ds, batch_size=2, min_size=32, max_size=64, max_gt=10, num_workers=2
        )
        batches = list(loader)
        assert len(batches) == 1
        b = batches[0]
        assert b["images"].shape[0] == 2
        assert b["images"].shape[3] == 3
        assert b["images"].shape[1] % 32 == 0 and b["images"].shape[2] % 32 == 0
        assert b["boxes"].shape == (2, 10, 4)
        assert b["valid"].sum() == 4
        # boxes rescaled into resized coords, inside the padded canvas
        assert b["boxes"][b["valid"]].max() <= max(b["images"].shape[1:3])

    def test_sharding_partitions_dataset(self, voc_dir):
        ann, img = voc_dir
        df = convert_annotations_to_df(ann, img)
        ds = PascalDataset(df)
        l0 = DetectionLoader(ds, 1, min_size=32, max_size=64, shard=0, num_shards=2)
        l1 = DetectionLoader(ds, 1, min_size=32, max_size=64, shard=1, num_shards=2)
        ids0 = [b["image_ids"][0] for b in l0]
        ids1 = [b["image_ids"][0] for b in l1]
        assert sorted(ids0 + ids1) == [0, 1]


class TestTransformOrderRegression:
    def test_photometric_on_uint8_stays_sane(self):
        """ToFloat must run FIRST: photometric transforms on raw uint8 would
        saturate the image to ~1.0 (all white) and silently destroy training."""
        from pytorch_retinanet_tpu.data import build_transforms

        t = build_transforms(
            [{"class_name": "albumentations.RandomBrightnessContrast",
              "params": {"p": 1.0, "brightness_limit": 0.1, "contrast_limit": 0.1}}]
        )
        img = np.full((16, 16, 3), 120, np.uint8)
        out, _, _ = t(img, np.zeros((0, 4), np.float32), np.zeros(0))
        assert 0.2 < out.mean() < 0.8, f"image saturated: mean={out.mean()}"

    def test_gaussnoise_on_uint8_stays_sane(self):
        from pytorch_retinanet_tpu.data import build_transforms

        t = build_transforms(
            [{"class_name": "albumentations.GaussNoise", "params": {"p": 1.0}}]
        )
        img = np.full((16, 16, 3), 120, np.uint8)
        out, _, _ = t(img, np.zeros((0, 4), np.float32), np.zeros(0))
        assert 0.2 < out.mean() < 0.8


class _SyntheticMixedDataset:
    """In-memory mixed-orientation dataset with size metadata (no file IO)."""

    def __init__(self, sizes):
        self.sizes = list(sizes)  # [(h, w), ...]

    def __len__(self):
        return len(self.sizes)

    def get_height_and_width(self, idx):
        return self.sizes[idx]

    def __getitem__(self, idx):
        h, w = self.sizes[idx]
        image = np.full((h, w, 3), 0.5, np.float32)
        boxes = np.array([[2.0, 2.0, w - 2.0, h - 2.0]], np.float32)
        return image, {"boxes": boxes, "labels": np.array([1])}, idx


class TestOrientationGroupedBatching:
    def test_mixed_dataset_compiles_only_two_buckets(self):
        """The headline two-compiled-programs contract: a shuffled
        mixed-orientation dataset must yield ONLY the landscape and portrait
        bucket shapes — never a letterboxed max x max canvas."""
        sizes = [(40, 80), (80, 40)] * 8  # 16 images, 50% portrait
        ds = _SyntheticMixedDataset(sizes)
        loader = DetectionLoader(ds, batch_size=4, min_size=32, max_size=64,
                                 max_gt=5, num_workers=2, shuffle=True, seed=3)
        shapes = {tuple(b["images"].shape[1:3]) for b in loader}
        assert shapes <= {(32, 64), (64, 32)}, shapes
        assert len(shapes) == 2  # both orientations actually seen

    def test_every_image_seen_exactly_once(self):
        sizes = [(40, 80)] * 5 + [(80, 40)] * 3  # uneven groups, partial batches
        ds = _SyntheticMixedDataset(sizes)
        loader = DetectionLoader(ds, batch_size=2, min_size=32, max_size=64,
                                 max_gt=5, num_workers=1, shuffle=True, seed=0)
        batches = list(loader)
        assert len(batches) == len(loader) == 5  # ceil(5/2) + ceil(3/2)
        ids = sorted(
            int(i) for b in batches for i in b["image_ids"][b["batch_mask"]]
        )
        assert ids == list(range(8))
        for b in batches:  # partial batches padded to the static batch size
            assert b["images"].shape[0] == 2

    def test_drop_last_drops_per_group_partials(self):
        ds = _SyntheticMixedDataset([(40, 80)] * 5 + [(80, 40)] * 3)
        loader = DetectionLoader(ds, batch_size=2, min_size=32, max_size=64,
                                 max_gt=5, num_workers=1, drop_last=True)
        batches = list(loader)
        assert len(batches) == len(loader) == 3  # 5//2 + 3//2

    def test_letterbox_fallback_without_metadata(self, tmp_path):
        """Datasets with no size metadata keep the old pad-to-batch-max
        behavior (torchvision semantics): landscape+portrait letterbox up."""
        import cv2

        rows = []
        for i, (h, w) in enumerate([(40, 80), (80, 40)]):
            p = str(tmp_path / f"{i}.png")
            cv2.imwrite(p, np.full((h, w, 3), 100, np.uint8))
            # no width/height columns → PascalDataset has no size metadata
            rows.append({"filename": p, "class": "x", "xmin": 2.0, "ymin": 2.0,
                         "xmax": w - 2.0, "ymax": h - 2.0, "labels": 1})
        ds = PascalDataset(pd.DataFrame(rows))
        assert ds.get_height_and_width(0) is None
        loader = DetectionLoader(ds, batch_size=2, min_size=32, max_size=64,
                                 max_gt=5, num_workers=1)
        (batch,) = list(loader)
        bh, bw = batch["images"].shape[1:3]
        assert bh == bw == 64  # letterboxed to the larger bucket both ways
        assert batch["batch_mask"].all()
        for i in range(2):
            nh, nw = batch["image_sizes"][i]
            box = batch["boxes"][i][batch["valid"][i]][0]
            assert box[2] <= nw + 1e-3 and box[3] <= nh + 1e-3

    def test_deterministic_augmentation_across_runs_and_workers(self, voc_dir):
        """Same seed ⇒ bit-identical batches, regardless of the thread-pool
        worker count (per-sample RNG keyed on (seed, epoch, index))."""
        from pytorch_retinanet_tpu.data import GaussNoise

        ann, img = voc_dir
        df = convert_annotations_to_df(ann, img)
        tfms = Compose([ToFloat(), HorizontalFlip(p=0.5), GaussNoise(p=1.0)])

        def run(workers):
            ds = PascalDataset(df, tfms)
            loader = DetectionLoader(ds, batch_size=1, min_size=32, max_size=64,
                                     max_gt=5, num_workers=workers, shuffle=True,
                                     seed=7)
            return [b["images"].copy() for b in loader]

        a, b, c = run(1), (run(4)), run(4)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        for x, y in zip(b, c):
            np.testing.assert_array_equal(x, y)

    def test_epochs_differ_but_reiterate_reproducibly(self, voc_dir):
        from pytorch_retinanet_tpu.data import GaussNoise

        ann, img = voc_dir
        df = convert_annotations_to_df(ann, img)
        tfms = Compose([ToFloat(), GaussNoise(p=1.0)])
        ds = PascalDataset(df, tfms)
        loader = DetectionLoader(ds, batch_size=2, min_size=32, max_size=64,
                                 max_gt=5, num_workers=2, seed=7)
        e0 = [b["images"].copy() for b in loader]  # epoch 0
        e1 = [b["images"].copy() for b in loader]  # epoch 1: different noise
        assert any((x != y).any() for x, y in zip(e0, e1))
        loader.epoch = 0  # resume from epoch 0 reproduces it exactly
        e0_again = [b["images"].copy() for b in loader]
        for x, y in zip(e0, e0_again):
            np.testing.assert_array_equal(x, y)

    def test_pascal_and_coco_expose_metadata(self, voc_dir, tmp_path):
        ann, img = voc_dir
        ds = PascalDataset(convert_annotations_to_df(ann, img))
        assert ds.get_height_and_width(0) == (60, 80)
        coco = CocoDetectionDataset(
            str(tmp_path),
            {"images": [{"id": 1, "height": 30, "width": 50, "file_name": "x.png"}],
             "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                              "bbox": [1, 1, 10, 10], "area": 100, "iscrowd": 0}],
             "categories": [{"id": 1, "name": "x"}]},
        )
        assert coco.get_height_and_width(0) == (30, 50)


class TestLoaderWorkerException:
    def test_worker_exception_propagates_to_consumer(self, tmp_path):
        """A sample-load failure must re-raise in the iterating thread, not
        leave the consumer blocked on the prefetch queue forever (torch
        DataLoader parity for worker exceptions)."""
        import pandas as pd

        from pytorch_retinanet_tpu.data import DetectionLoader, PascalDataset

        csv = str(tmp_path / "bad.csv")
        pd.DataFrame(
            [{"filename": str(tmp_path / "does_not_exist.png"), "width": 80,
              "height": 100, "class": "car", "xmin": 1.0, "ymin": 1.0,
              "xmax": 20.0, "ymax": 20.0, "labels": 1}]
        ).to_csv(csv, index=False)
        ds = PascalDataset(csv)
        loader = DetectionLoader(ds, 1, min_size=64, max_size=96, num_workers=1)
        with pytest.raises(Exception):
            next(iter(loader))


class TestLoaderUint8Wire:
    def test_uint8_image_dtype_batches(self, tmp_path):
        """image_dtype=uint8 ships raw bytes: batch images are uint8 and
        equal the f32 batch up to the /255 quantization grid."""
        import cv2

        from pytorch_retinanet_tpu.data import DetectionLoader, PascalDataset

        img = np.random.default_rng(0).integers(0, 256, (100, 80, 3), np.uint8)
        path = str(tmp_path / "im.png")
        cv2.imwrite(path, img)
        csv = str(tmp_path / "ds.csv")
        pd.DataFrame(
            [{"filename": path, "width": 80, "height": 100, "class": "car",
              "xmin": 1.0, "ymin": 1.0, "xmax": 20.0, "ymax": 20.0,
              "labels": 1}]
        ).to_csv(csv, index=False)
        ds = PascalDataset(csv)
        kw = dict(min_size=64, max_size=96, num_workers=1)
        b8 = next(iter(DetectionLoader(ds, 1, image_dtype=np.uint8, **kw)))
        bf = next(iter(DetectionLoader(ds, 1, **kw)))
        assert b8["images"].dtype == np.uint8
        assert bf["images"].dtype == np.float32
        np.testing.assert_allclose(
            b8["images"].astype(np.float32) / 255.0, bf["images"], atol=1 / 255
        )
        np.testing.assert_array_equal(b8["boxes"], bf["boxes"])


class TestKeepBytesChain:
    """Round-5 byte-preserving pipeline: keep_bytes + image_dtype='auto'."""

    def test_keep_bytes_geometric_chain_stays_uint8(self):
        tfms = build_transforms(
            [{"class_name": "HorizontalFlip", "params": {"p": 1.0}}],
            keep_bytes=True,
        )
        img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        out, _, _ = tfms(img, np.zeros((0, 4), np.float32), np.zeros(0, np.int64))
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, img[:, ::-1])

    def test_keep_bytes_photometric_chain_keeps_tofloat(self):
        tfms = build_transforms(
            [
                {"class_name": "HorizontalFlip", "params": {"p": 0.0}},
                {"class_name": "RandomBrightnessContrast", "params": {"p": 0.0}},
            ],
            keep_bytes=True,
        )
        img = np.full((4, 4, 3), 128, np.uint8)
        out, _, _ = tfms(img, np.zeros((0, 4), np.float32), np.zeros(0, np.int64))
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, 128 / 255.0)

    def test_keep_bytes_flip_matches_float_path_exactly(self):
        """flip(u8)/255 == flip(u8/255): the byte chain is exact for
        geometric transforms (loader 'auto' wire soundness)."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (8, 10, 3), np.uint8)
        boxes = np.asarray([[1.0, 1.0, 5.0, 6.0]], np.float32)
        labels = np.asarray([2], np.int64)
        byte_chain = build_transforms(
            [{"class_name": "HorizontalFlip", "params": {"p": 1.0}}],
            keep_bytes=True,
        )
        float_chain = build_transforms(
            [{"class_name": "HorizontalFlip", "params": {"p": 1.0}}]
        )
        ob, bb, _ = byte_chain(img, boxes.copy(), labels, np.random.default_rng(0))
        of, bf, _ = float_chain(img, boxes.copy(), labels, np.random.default_rng(0))
        np.testing.assert_array_equal(ob.astype(np.float32) / 255.0, of)
        np.testing.assert_array_equal(bb, bf)

    def test_auto_wire_resolves_per_chain(self, tmp_path):
        import cv2

        img = np.random.default_rng(0).integers(0, 256, (100, 80, 3), np.uint8)
        path = str(tmp_path / "im.png")
        cv2.imwrite(path, img)
        csv = str(tmp_path / "ds.csv")
        pd.DataFrame(
            [{"filename": path, "width": 80, "height": 100, "class": "car",
              "xmin": 1.0, "ymin": 1.0, "xmax": 20.0, "ymax": 20.0,
              "labels": 1}]
        ).to_csv(csv, index=False)
        kw = dict(min_size=64, max_size=96, num_workers=1)

        byte_ds = PascalDataset(csv, transforms=build_transforms(
            [{"class_name": "HorizontalFlip", "params": {"p": 0.0}}],
            keep_bytes=True,
        ))
        b = next(iter(DetectionLoader(byte_ds, 1, image_dtype="auto", **kw)))
        assert b["images"].dtype == np.uint8

        float_ds = PascalDataset(csv, transforms=build_transforms(None))
        f = next(iter(DetectionLoader(float_ds, 1, image_dtype="auto", **kw)))
        assert f["images"].dtype == np.float32
        np.testing.assert_allclose(
            b["images"].astype(np.float32) / 255.0, f["images"], atol=1 / 255
        )

    def test_single_pad_collate_matches_resize_to_bucket(self, tmp_path):
        """The collate-time pad writes exactly what the old per-sample
        resize_to_bucket pad produced."""
        import cv2

        from pytorch_retinanet_tpu.models.retinanet import resize_to_bucket

        img = np.random.default_rng(1).integers(0, 256, (90, 70, 3), np.uint8)
        path = str(tmp_path / "im.png")
        cv2.imwrite(path, img)
        csv = str(tmp_path / "ds.csv")
        pd.DataFrame(
            [{"filename": path, "width": 70, "height": 90, "class": "car",
              "xmin": 1.0, "ymin": 1.0, "xmax": 20.0, "ymax": 20.0,
              "labels": 1}]
        ).to_csv(csv, index=False)
        ds = PascalDataset(csv, transforms=build_transforms(None))
        batch = next(iter(DetectionLoader(
            ds, 1, min_size=64, max_size=96, num_workers=1
        )))
        image, _, _ = ds[0]
        padded, _, _ = resize_to_bucket(image, 64, 96)
        np.testing.assert_array_equal(batch["images"][0], padded)
