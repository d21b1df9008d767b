"""jax.export serving-artifact round trip (pytorch_retinanet_tpu/export.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pytorch_retinanet_tpu.export import export_inference, load_exported
from pytorch_retinanet_tpu.models import Retinanet
from pytorch_retinanet_tpu.models.retinanet import resolution_buckets


@pytest.fixture(scope="module")
def net():
    return Retinanet(
        num_classes=4, backbone_kind="resnet18", min_size=64, max_size=96,
        pretrained=False,
    )


class TestExport:
    def test_roundtrip_matches_direct_inference(self, net):
        import jax.numpy as jnp

        bucket = resolution_buckets(net.min_size, net.max_size)[0]
        blob = export_inference(net, batch_size=2, bucket=bucket)
        assert isinstance(blob, bytes) and len(blob) > 1000

        infer = load_exported(blob)
        rng = np.random.default_rng(0)
        images = rng.random((2, *bucket, 3)).astype(np.float32)
        sizes = np.tile(np.asarray([bucket], np.float32), (2, 1))

        out = infer(images, sizes)
        direct = net._predict_impl(
            net.variables, jnp.asarray(images), jnp.asarray(sizes)
        )
        np.testing.assert_allclose(out["boxes"], np.asarray(direct.boxes), atol=1e-4)
        np.testing.assert_allclose(out["scores"], np.asarray(direct.scores), atol=1e-5)
        np.testing.assert_array_equal(out["labels"], np.asarray(direct.labels))
        np.testing.assert_array_equal(out["valid"], np.asarray(direct.valid))

    def test_file_roundtrip(self, net, tmp_path):
        from pytorch_retinanet_tpu.export import save_exported

        bucket = resolution_buckets(net.min_size, net.max_size)[0]
        path = save_exported(net, str(tmp_path / "m.stablehlo"), 1, bucket)
        infer = load_exported(path)
        images = np.zeros((1, *bucket, 3), np.float32)
        sizes = np.asarray([bucket], np.float32)
        out = infer(images, sizes)
        assert set(out) == {"boxes", "scores", "labels", "valid"}
        assert out["boxes"].shape[0] == 1
        # Sidecar records the TRUE resize rule, not the ceil32'd bucket dims.
        assert infer.meta is not None
        assert infer.meta["min_size"] == net.min_size
        assert infer.meta["max_size"] == net.max_size


class TestUint8Export:
    def test_uint8_artifact_matches_f32(self, net, tmp_path):
        """An artifact exported with wire_dtype=uint8 takes raw bytes and
        produces the same detections as the f32 artifact fed bytes/255."""
        import jax.numpy as jnp

        from pytorch_retinanet_tpu.export import save_exported

        bucket = resolution_buckets(net.min_size, net.max_size)[0]
        p8 = save_exported(
            net, str(tmp_path / "u8.stablehlo"), 1, bucket, wire_dtype="uint8"
        )
        infer8 = load_exported(p8)
        assert infer8.in_avals[0].dtype == np.uint8
        assert infer8.meta["wire_dtype"] == "uint8"

        rng = np.random.default_rng(0)
        u8 = rng.integers(0, 256, (1, *bucket, 3), np.uint8)
        sizes = np.asarray([bucket], np.float32)
        out8 = infer8(u8, sizes)
        direct = net._predict_fn(
            net.variables,
            jnp.asarray(u8.astype(np.float32) / 255.0),
            jnp.asarray(sizes),
        )
        # Same detection set up to folded-constant rounding in bf16.
        np.testing.assert_array_equal(out8["valid"], np.asarray(direct.valid))
        n = int(out8["valid"].sum())
        np.testing.assert_allclose(
            out8["boxes"][0, :n], np.asarray(direct.boxes)[0, :n], atol=0.1
        )
        np.testing.assert_allclose(
            out8["scores"][0, :n], np.asarray(direct.scores)[0, :n], atol=1e-3
        )

    def test_dispatch_is_async_form(self, net, tmp_path):
        from pytorch_retinanet_tpu.export import save_exported

        bucket = resolution_buckets(net.min_size, net.max_size)[0]
        path = save_exported(net, str(tmp_path / "d.stablehlo"), 1, bucket)
        infer = load_exported(path)
        images = np.zeros((1, *bucket, 3), np.float32)
        sizes = np.asarray([bucket], np.float32)
        dev = infer.dispatch(images, sizes)
        assert len(dev) == 4  # boxes, scores, labels, valid device arrays
        host = infer(images, sizes)
        np.testing.assert_array_equal(np.asarray(dev[3]), host["valid"])
