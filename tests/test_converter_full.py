"""Full-detector torch→JAX conversion + whole-model logits parity.

Closes the last unverified link of the parity chain: backbone features were
torch-parity-tested (test_converter.py) and postprocess was oracle-parity-tested
(test_reference_parity.py), but FPN + head forward had only self-consistency
checks. Here a full reference-schema torch detector (tools/reference_oracle.py
DetectorOracle — `backbone.backbone.* / fpn.* / retinanet_head.*` keys exactly
like `torch.save(litModel.net.state_dict())`, reference demo cells 23/25) is
randomly initialized, converted with `torch_retinanet_to_flax`, and the flax
model's cls/box logits are required to match the torch forward end-to-end.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from reference_oracle import DetectorOracle  # noqa: E402
from test_converter import (  # noqa: E402
    TBasicBlock,
    TBottleneck,
    TResNet,
    randomize_bn_stats,
)

from pytorch_retinanet_tpu import config as C  # noqa: E402
from pytorch_retinanet_tpu.models.converter import (  # noqa: E402
    load_torch_retinanet,
    torch_retinanet_to_flax,
)
from pytorch_retinanet_tpu.models.retinanet import RetinaNetModule  # noqa: E402

NUM_CLASSES = 7
H, W = 64, 96  # -> c3 8x12, c4 4x6, c5 2x3: all five pyramid levels exercised


def build_oracle(kind, block, layers, fpn_sizes, seed=0):
    torch.manual_seed(seed)
    oracle = DetectorOracle(
        TResNet(block, layers), fpn_sizes, num_anchors=9, num_classes=NUM_CLASSES
    ).eval()
    randomize_bn_stats(oracle, seed=seed)
    # Non-zero biases everywhere so bias conversion is actually load-bearing.
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for name, p in oracle.named_parameters():
            if name.endswith(".bias"):
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return oracle


@pytest.mark.parametrize(
    "kind,block,layers,fpn_sizes",
    [
        ("resnet18", TBasicBlock, [2, 2, 2, 2], (128, 256, 512)),
        ("resnet50", TBottleneck, [3, 4, 6, 3], (512, 1024, 2048)),
    ],
)
def test_whole_model_logits_parity(kind, block, layers, fpn_sizes):
    oracle = build_oracle(kind, block, layers, fpn_sizes)

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, H, W, 3)).astype(np.float32)  # [0,1] like predict
    mean = np.asarray(C.MEAN, np.float32)
    std = np.asarray(C.STD, np.float32)
    timg = torch.from_numpy(((img - mean) / std).transpose(0, 3, 1, 2))

    with torch.no_grad():
        tcls, tbox = oracle(timg)

    params, stats = torch_retinanet_to_flax(oracle.state_dict(), kind)
    module = RetinaNetModule(
        backbone_kind=kind, num_classes=NUM_CLASSES, freeze_bn=True, dtype=jnp.float32
    )
    jcls, jbox = module.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(img), False
    )

    assert jcls.shape == tuple(tcls.shape) and jbox.shape == tuple(tbox.shape)
    np.testing.assert_allclose(np.asarray(jcls), tcls.numpy(), rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(jbox), tbox.numpy(), rtol=1e-4, atol=5e-4)


def test_load_state_dict_accepts_reference_schema():
    """Retinanet.load_state_dict routes a flat torch-style dict through the
    converter (the reference's documented reload flow, demo cell 25)."""
    from pytorch_retinanet_tpu.models.retinanet import Retinanet

    oracle = build_oracle("resnet18", TBasicBlock, [2, 2, 2, 2], (128, 256, 512))
    net = Retinanet(
        num_classes=NUM_CLASSES,
        backbone_kind="resnet18",
        pretrained=False,
        min_size=H,
        max_size=W,
    )
    before = np.asarray(
        net.variables["params"]["head"]["cls_subnet"]["predictor"]["bias"]
    ).copy()
    net.load_state_dict({k: v.numpy() for k, v in oracle.state_dict().items()})
    after = np.asarray(
        net.variables["params"]["head"]["cls_subnet"]["predictor"]["bias"]
    )
    ref = oracle.retinanet_head.classification_head.class_subnet_output.bias
    np.testing.assert_allclose(after, ref.detach().numpy(), rtol=1e-6, atol=1e-6)
    assert not np.allclose(before, after)

    # Converted weights must drive the real predict path without shape errors.
    out = net.predict([np.zeros((H, W, 3), np.float32)])
    assert set(out[0]) == {"boxes", "scores", "labels"}


class TestTorchExport:
    """JAX → torch export (models/converter.py flax_retinanet_to_torch): the
    reverse migration path — weights trained here must load into a reference
    ``Retinanet`` via its documented ``load_state_dict`` flow."""

    def test_roundtrip_is_exact(self):
        from pytorch_retinanet_tpu.models.converter import flax_retinanet_to_torch

        oracle = build_oracle("resnet50", TBottleneck, [3, 4, 6, 3], (512, 1024, 2048))
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        params, stats = torch_retinanet_to_flax(sd, "resnet50")
        back = flax_retinanet_to_torch(
            {"params": params, "batch_stats": stats}, "resnet50"
        )
        tracked = {k for k in sd if k.endswith("num_batches_tracked")}
        assert set(back) == set(sd) | {
            k for k in back if k.endswith("num_batches_tracked")
        }
        for k in set(sd) - tracked:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    def test_export_loads_strict_and_matches_logits(self):
        """Fresh flax weights → export → torch strict load → logits parity
        (the mirror image of test_whole_model_logits_parity)."""
        from pytorch_retinanet_tpu.models.converter import flax_retinanet_to_torch

        module = RetinaNetModule(
            backbone_kind="resnet18", num_classes=NUM_CLASSES, freeze_bn=True,
            dtype=jnp.float32,
        )
        variables = module.init(jax.random.PRNGKey(3), jnp.zeros((1, H, W, 3)))
        sd = flax_retinanet_to_torch(variables, "resnet18")

        oracle = DetectorOracle(
            TResNet(TBasicBlock, [2, 2, 2, 2]), (128, 256, 512),
            num_anchors=9, num_classes=NUM_CLASSES,
        ).eval()
        missing, unexpected = oracle.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            strict=True,
        )
        assert not missing and not unexpected

        rng = np.random.default_rng(5)
        img = rng.uniform(size=(2, H, W, 3)).astype(np.float32)
        mean = np.asarray(C.MEAN, np.float32)
        std = np.asarray(C.STD, np.float32)
        with torch.no_grad():
            tcls, tbox = oracle(
                torch.from_numpy(((img - mean) / std).transpose(0, 3, 1, 2))
            )
        jcls, jbox = module.apply(variables, jnp.asarray(img), False)
        np.testing.assert_allclose(np.asarray(jcls), tcls.numpy(), rtol=1e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(jbox), tbox.numpy(), rtol=1e-4, atol=5e-4)

    def test_s2d_stem_export(self):
        """A converted s2d stem exports back to the exact 7x7 kernel; learned
        out-of-field taps (possible after s2d TRAINING) refuse loudly."""
        from pytorch_retinanet_tpu.models.converter import _s2d_kernel_to_7x7
        from pytorch_retinanet_tpu.models.layers import stem_kernel_to_s2d

        rng = np.random.default_rng(7)
        k7 = rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
        k4 = np.asarray(stem_kernel_to_s2d(k7))
        np.testing.assert_array_equal(_s2d_kernel_to_7x7(k4), k7)

        k8 = (
            k4.reshape(4, 4, 2, 2, 3, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(8, 8, 3, 64)
        )
        k8[0, 4, 1, 2] = 0.5  # an out-of-field tap a trained s2d stem can learn
        bad = (
            k8.reshape(4, 2, 4, 2, 3, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 12, 64)
        )
        with pytest.raises(ValueError, match="outside the 7x7"):
            _s2d_kernel_to_7x7(bad)

    def test_save_and_reference_reload_flow(self, tmp_path):
        """net.save_torch_state_dict → torch.load → a second net's
        load_state_dict (the reference's documented save/reload loop, now
        closed in BOTH directions)."""
        from pytorch_retinanet_tpu.models.retinanet import Retinanet

        net = Retinanet(
            num_classes=NUM_CLASSES, backbone_kind="resnet18", pretrained=False,
            min_size=H, max_size=W,
        )
        path = str(tmp_path / "export.pth")
        net.save_torch_state_dict(path)

        net2 = Retinanet(
            num_classes=NUM_CLASSES, backbone_kind="resnet18", pretrained=False,
            min_size=H, max_size=W,
        )
        net2.load_state_dict(
            {k: v.numpy() for k, v in torch.load(path, weights_only=True).items()}
        )
        a = np.asarray(net.variables["params"]["head"]["cls_subnet"]["predictor"]["bias"])
        b = np.asarray(net2.variables["params"]["head"]["cls_subnet"]["predictor"]["bias"])
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
        w_a = np.asarray(net.variables["params"]["fpn"]["lateral_c3"]["kernel"])
        w_b = np.asarray(net2.variables["params"]["fpn"]["lateral_c3"]["kernel"])
        np.testing.assert_allclose(w_a, w_b, rtol=1e-6, atol=1e-6)


def test_full_converter_error_surface():
    oracle = build_oracle("resnet18", TBasicBlock, [2, 2, 2, 2], (128, 256, 512))
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    missing = dict(sd)
    missing.pop("fpn.conv_c6_3x3.weight")
    with pytest.raises(KeyError, match="conv_c6_3x3"):
        torch_retinanet_to_flax(missing, "resnet18")

    extra = dict(sd)
    extra["retinanet_head.mystery.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(KeyError, match="unrecognized"):
        torch_retinanet_to_flax(extra, "resnet18")

    # Wrong-architecture load must fail loudly on shape check, not load junk.
    module = RetinaNetModule(
        backbone_kind="resnet50", num_classes=NUM_CLASSES, dtype=jnp.float32
    )
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    with pytest.raises((ValueError, KeyError)):
        load_torch_retinanet(variables, sd, "resnet50")

    # Anchor-generator buffers in a checkpoint are constants → ignored cleanly.
    with_anchors = dict(sd)
    with_anchors["anchor_generator.cell_anchors.0"] = np.zeros((9, 4), np.float32)
    params, _ = torch_retinanet_to_flax(with_anchors, "resnet18")
    assert "fpn" in params and "head" in params

    # Unknown TRUNK weights must also trip the refuse-partial-load check:
    # the backbone mapper only marks keys it actually read as consumed
    # (regression: a blanket update once swallowed e.g. SE-block weights).
    extra_trunk = dict(sd)
    extra_trunk["backbone.backbone.layer1.0.se.fc.weight"] = np.zeros(
        (4, 4), np.float32
    )
    with pytest.raises(KeyError, match="unrecognized"):
        torch_retinanet_to_flax(extra_trunk, "resnet18")
