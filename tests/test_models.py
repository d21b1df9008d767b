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
