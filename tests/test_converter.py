"""torch→JAX converter parity: features must match a real torch ResNet.

Builds a minimal torchvision-compatible ResNet in torch (same state_dict key
schema as the torchvision model zoo checkpoints the reference downloads,
reference backbone.py:269-274), runs both frameworks on the same input, and
requires C3/C4/C5 feature parity within float tolerance — validating conv
padding semantics, BN math, block wiring, and the key mapping all at once.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from pytorch_retinanet_tpu.models import ResNetBackbone
from pytorch_retinanet_tpu.models.converter import torch_resnet_to_flax


# --------------------------------------------------------------------------- #
# Minimal torchvision-schema ResNet (keys: conv1, bn1, layer{1-4}.{i}.*)
# --------------------------------------------------------------------------- #
class TBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample
        self.relu = tnn.ReLU(inplace=True)

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)  # V1.5
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        self.relu = tnn.ReLU(inplace=True)

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TResNet(tnn.Module):
    def __init__(self, block, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


def randomize_bn_stats(model: tnn.Module, seed: int = 0) -> None:
    """Non-trivial running stats so frozen-BN math is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)


@pytest.mark.parametrize(
    "kind,block,layers",
    [
        ("resnet18", TBasicBlock, [2, 2, 2, 2]),
        ("resnet50", TBottleneck, [3, 4, 6, 3]),
    ],
)
def test_feature_parity_torch_vs_flax(kind, block, layers):
    torch.manual_seed(0)
    tmodel = TResNet(block, layers).eval()
    randomize_bn_stats(tmodel)

    x = torch.randn(1, 3, 64, 96)
    with torch.no_grad():
        tc3, tc4, tc5 = tmodel(x)

    params, stats = torch_resnet_to_flax(tmodel.state_dict(), kind)
    fmodel = ResNetBackbone(
        kind=kind, freeze_bn=True, stem_s2d=False, dtype=jnp.float32
    )
    feats = fmodel.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        False,
    )

    for name, tfeat in [("c3", tc3), ("c4", tc4), ("c5", tc5)]:
        ours = np.asarray(feats[name]).transpose(0, 3, 1, 2)
        ref = tfeat.numpy()
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4), name

    # Space-to-depth stem with the transformed kernel must match too — it is
    # the same convolution, repacked (models/layers.py stem_kernel_to_s2d).
    from pytorch_retinanet_tpu.models.layers import stem_kernel_to_s2d

    params_s2d = dict(params)
    params_s2d["stem_conv"] = {
        "kernel": stem_kernel_to_s2d(params["stem_conv"]["kernel"])
    }
    fmodel_s2d = ResNetBackbone(
        kind=kind, freeze_bn=True, stem_s2d=True, dtype=jnp.float32
    )
    feats_s2d = fmodel_s2d.apply(
        {"params": params_s2d, "batch_stats": stats},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        False,
    )
    for name, tfeat in [("c3", tc3), ("c4", tc4), ("c5", tc5)]:
        np.testing.assert_allclose(
            np.asarray(feats_s2d[name]).transpose(0, 3, 1, 2),
            tfeat.numpy(),
            rtol=1e-4, atol=1e-4,
            err_msg=f"s2d stem diverged at {name}",
        )


def test_converter_rejects_shape_mismatch():
    from pytorch_retinanet_tpu.models.converter import load_torch_resnet

    torch.manual_seed(0)
    tmodel = TResNet(TBasicBlock, [2, 2, 2, 2])
    sd = tmodel.state_dict()
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pth")
        torch.save(sd, path)
        # resnet50 expects bottleneck shapes — must raise, not silently load
        import jax

        fmodel = ResNetBackbone(kind="resnet50", dtype=jnp.float32)
        variables = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        with pytest.raises((ValueError, KeyError)):
            load_torch_resnet({"params": {"backbone": variables["params"]},
                               "batch_stats": {"backbone": variables["batch_stats"]}},
                              path, "resnet50")
