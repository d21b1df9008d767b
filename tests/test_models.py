"""Model stack tests: shape contracts, anchor alignment, predict API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_retinanet_tpu.models import (
    Retinanet,
    RetinaNetModule,
    backbone_out_channels,
    resize_to_bucket,
    resolution_buckets,
)
from pytorch_retinanet_tpu.ops import generate_anchors, generate_anchors_per_level


class TestModuleShapes:
    @pytest.mark.parametrize("kind", ["resnet18", "resnet50"])
    def test_outputs_align_with_anchors(self, kind):
        size = (64, 96)
        m = RetinaNetModule(backbone_kind=kind, num_classes=5)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)))
        cls, box = m.apply(v, jnp.zeros((2, *size, 3)))
        anchors = generate_anchors(size)
        assert cls.shape == (2, anchors.shape[0], 5)
        assert box.shape == (2, anchors.shape[0], 4)
        assert cls.dtype == jnp.float32

    def test_per_level_outputs_align(self):
        size = (64, 96)
        m = RetinaNetModule(backbone_kind="resnet18", num_classes=3)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)))
        cls_l, box_l = m.apply(v, jnp.zeros((1, *size, 3)), False, return_levels=True)
        anchors_l = generate_anchors_per_level(size)
        assert len(cls_l) == 5
        for c, b, a in zip(cls_l, box_l, anchors_l):
            assert c.shape[1] == a.shape[0]
            assert b.shape[1] == a.shape[0]

    def test_prior_bias_init_probability(self):
        """Class predictor bias init => initial sigmoid ~ prior (0.01)."""
        m = RetinaNetModule(backbone_kind="resnet18", num_classes=4, prior=0.01)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        cls, _ = m.apply(v, jnp.zeros((1, 64, 64, 3)))
        p = jax.nn.sigmoid(cls)
        assert 0.005 < float(p.mean()) < 0.02

    def test_backbone_channels_static(self):
        assert backbone_out_channels("resnet18") == (128, 256, 512)
        assert backbone_out_channels("resnet152") == (512, 1024, 2048)


class TestResize:
    def test_buckets(self):
        # 800 is already a multiple of 32; 1333 rounds up to 1344
        assert resolution_buckets(800, 1333) == ((800, 1344), (1344, 800))
        assert resolution_buckets(512, 512) == ((512, 512),)
        assert resolution_buckets(801, 1333) == ((832, 1344), (1344, 832))

    def test_resize_rule_matches_reference(self):
        # 600x400 image, min 800 max 1333: scale = min(800/400, 1333/600) = 2.22
        img = np.zeros((600, 400, 3), np.uint8)
        padded, (nh, nw), (oh, ow) = resize_to_bucket(img, 800, 1333)
        scale = min(800 / 400, 1333 / 600)
        assert (nh, nw) == (round(600 * scale), round(400 * scale))
        assert (oh, ow) == (600, 400)
        # portrait bucket (800 = 25*32 stays; 1333 -> 1344)
        assert padded.shape[:2] == (1344, 800)

    def test_small_image_upscales(self):
        img = np.zeros((50, 100, 3), np.uint8)
        _, (nh, nw), _ = resize_to_bucket(img, 96, 160)
        assert min(nh, nw) in (96, 95) or max(nh, nw) == 160


class TestRetinanetObject:
    @pytest.fixture(scope="class")
    def net(self):
        return Retinanet(
            num_classes=3, backbone_kind="resnet18", min_size=32, max_size=64,
            pretrained=False,
        )

    def test_ctor_validates_backbone(self):
        with pytest.raises(ValueError):
            Retinanet(backbone_kind="resnet99")

    def test_predict_mixed_orientations(self, net):
        """Landscape + portrait images group into separate buckets but both
        come back, boxes in original coordinates."""
        imgs = [
            np.random.randint(0, 255, (40, 80, 3), np.uint8),   # landscape
            np.random.randint(0, 255, (80, 40, 3), np.uint8),   # portrait
        ]
        out = net.predict(imgs)
        assert len(out) == 2
        for o, im in zip(out, imgs):
            assert set(o) == {"boxes", "scores", "labels"}
            if len(o["boxes"]):
                assert o["boxes"][:, 0::2].max() <= im.shape[1] + 1e-3
                assert o["boxes"][:, 1::2].max() <= im.shape[0] + 1e-3

    def test_forward_ragged_reference_form(self, net):
        imgs = [np.random.rand(40, 60, 3).astype(np.float32)]
        targets = [{"boxes": np.array([[5.0, 5, 30, 30]], np.float32),
                    "labels": np.array([2])}]
        losses = net.forward(imgs, targets)
        assert set(losses) == {"classification_loss", "regression_loss"}
        assert np.isfinite(float(losses["classification_loss"]))

    def test_state_dict_roundtrip(self, net):
        sd = jax.device_get(net.state_dict())
        net2 = Retinanet(
            num_classes=3, backbone_kind="resnet18", min_size=32, max_size=64,
            pretrained=False, seed=1,
        )
        net2.load_state_dict(sd)
        a = jax.tree_util.tree_leaves(net.variables)
        b = jax.tree_util.tree_leaves(net2.variables)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestUint8Wire:
    """uint8 wire format: the device program normalizes from raw bytes (the
    /255 folds into the normalize constants) — same results as the f32 [0,1]
    input path, 4x fewer host->device bytes per request."""

    def test_uint8_forward_matches_f32(self):
        size = (64, 96)
        m = RetinaNetModule(backbone_kind="resnet18", num_classes=4)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)))
        u8 = np.random.default_rng(0).integers(0, 256, (2, *size, 3), np.uint8)
        f32 = u8.astype(np.float32) / 255.0
        cls_u, box_u = m.apply(v, jnp.asarray(u8))
        cls_f, box_f = m.apply(v, jnp.asarray(f32))
        # Same math up to the folded-constant rounding (bf16 trunk).
        np.testing.assert_allclose(
            np.asarray(cls_u), np.asarray(cls_f), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(box_u), np.asarray(box_f), rtol=1e-4, atol=1e-5
        )

    def test_resize_to_bucket_uint8_wire(self):
        img = np.random.default_rng(0).integers(0, 256, (100, 80, 3), np.uint8)
        padded_u8, hw_u8, orig_u8 = resize_to_bucket(
            img, 64, 96, wire_dtype=np.uint8
        )
        padded_f32, hw_f32, orig_f32 = resize_to_bucket(img, 64, 96)
        assert padded_u8.dtype == np.uint8
        assert padded_f32.dtype == np.float32
        assert padded_u8.shape == padded_f32.shape
        assert hw_u8 == hw_f32 and orig_u8 == orig_f32
        np.testing.assert_allclose(
            padded_u8.astype(np.float32) / 255.0, padded_f32, atol=1e-6
        )


class TestPackedDetections:
    def test_pack_unpack_roundtrip(self):
        from pytorch_retinanet_tpu.ops import (
            Detections,
            pack_detections,
            unpack_detections,
        )

        rng = np.random.default_rng(0)
        det = Detections(
            boxes=jnp.asarray(rng.random((2, 5, 4), np.float32) * 100),
            scores=jnp.asarray(rng.random((2, 5), np.float32)),
            labels=jnp.asarray(rng.integers(1, 9, (2, 5)), jnp.int32),
            valid=jnp.asarray([[1, 1, 0, 1, 0], [0, 1, 1, 0, 0]], bool),
        )
        packed = pack_detections(det)
        assert packed.shape == (2, 5, 6)
        out = unpack_detections(np.asarray(packed))
        np.testing.assert_allclose(out.boxes, np.asarray(det.boxes), rtol=1e-6)
        np.testing.assert_allclose(out.scores, np.asarray(det.scores), rtol=1e-6)
        np.testing.assert_array_equal(out.valid, np.asarray(det.valid))
        # labels agree wherever valid; invalid rows are 0-marked
        np.testing.assert_array_equal(
            out.labels[out.valid], np.asarray(det.labels)[np.asarray(det.valid)]
        )
        assert (out.labels[~out.valid] == 0).all()
