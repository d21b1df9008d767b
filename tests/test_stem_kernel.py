"""Fused Pallas stem kernel (kernels/stem_pallas.py) parity tests.

All kernel runs use interpret mode (CPU CI); compiled-on-TPU parity is
captured by tools/tpu_selfcheck.py into TPU_SELFCHECK.json.

Covers:
  * kernel vs the exact XLA composition it fuses (stem_reference_xla)
  * stem_reference_xla vs the flax module stem (conv_kaiming + BatchNorm +
    relu + max_pool_torch) — validates the folded-BN algebra
  * full-model equivalence: RetinaNetModule with stem_in= vs without
  * gradients through the custom VJP
  * shape gating
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_retinanet_tpu.kernels import (
    fused_stem,
    fused_stem_supported,
    stem_reference_xla,
)
from pytorch_retinanet_tpu.kernels.stem_pallas import _fused_stem
from pytorch_retinanet_tpu.models.backbone import ResNetBackbone
from pytorch_retinanet_tpu.models.retinanet import RetinaNetModule


@pytest.fixture(scope="module")
def stem_setup():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, 64, 96, 3), np.float32))
    backbone = ResNetBackbone(kind="resnet18", dtype=jnp.bfloat16)
    variables = backbone.init(jax.random.PRNGKey(1), images)
    # Non-trivial BN statistics (init is mean 0 / var 1 — too easy).
    bn = variables["batch_stats"]["stem_bn"]["BatchNorm_0"]
    bn["mean"] = jnp.asarray(rng.normal(0, 0.3, 64), jnp.float32)
    bn["var"] = jnp.asarray(rng.uniform(0.5, 2.0, 64), jnp.float32)
    return images, variables


def _folded(variables):
    p = variables["params"]
    s = variables["batch_stats"]
    w7 = p["stem_conv"]["kernel"]
    bnp = p["stem_bn"]["BatchNorm_0"]
    bns = s["stem_bn"]["BatchNorm_0"]
    scale = bnp["scale"] / jnp.sqrt(bns["var"] + 1e-5)
    bias = bnp["bias"] - bns["mean"] * scale
    return w7, scale, bias


class TestStemKernel:
    def test_kernel_matches_xla_reference(self, stem_setup):
        images, variables = stem_setup
        w7, scale, bias = _folded(variables)
        ref = stem_reference_xla(images, w7, scale, bias)
        out = _fused_stem(images, w7, scale, bias, True)  # interpret
        assert out.shape == ref.shape == (2, 16, 24, 64)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=0.03, rtol=0.03,
        )

    def test_xla_reference_matches_flax_stem(self, stem_setup):
        """stem_reference_xla == the module's conv/BN/relu/pool composition
        (the folded scale/bias algebra is exact up to bf16 rounding)."""
        from pytorch_retinanet_tpu.models.layers import max_pool_torch

        images, variables = stem_setup
        backbone = ResNetBackbone(kind="resnet18", dtype=jnp.bfloat16)
        _, inter = backbone.apply(
            variables, images,
            capture_intermediates=lambda m, _n: m.name == "stem_bn",
            mutable=["intermediates"],
        )
        bn_out = jax.tree_util.tree_leaves(inter["intermediates"])[0]
        flax_stem = max_pool_torch(jax.nn.relu(bn_out), 3, 2)
        w7, scale, bias = _folded(variables)
        ref = stem_reference_xla(images.astype(jnp.bfloat16), w7, scale, bias)
        np.testing.assert_allclose(
            np.asarray(ref, np.float32), np.asarray(flax_stem, np.float32),
            atol=0.05, rtol=0.05,
        )

    def test_full_model_equivalence_with_stem_in(self, stem_setup):
        """RetinaNetModule(images, stem_in=fused) == the standard forward."""
        rng = np.random.default_rng(2)
        images = jnp.asarray(rng.random((1, 64, 96, 3), np.float32))
        module = RetinaNetModule(backbone_kind="resnet18", num_classes=5)
        variables = module.init(jax.random.PRNGKey(0), images)
        cls_ref, box_ref = module.apply(variables, images, False)
        stem = fused_stem(
            variables, images, mean=module.mean, std=module.std, interpret=True
        )
        cls_f, box_f = module.apply(variables, images, False, stem_in=stem)
        np.testing.assert_allclose(
            np.asarray(cls_f, np.float32), np.asarray(cls_ref, np.float32),
            atol=0.1, rtol=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(box_f, np.float32), np.asarray(box_ref, np.float32),
            atol=0.1, rtol=0.1,
        )

    def test_gradients_match_xla_reference(self, stem_setup):
        images, variables = stem_setup
        w7, scale, bias = _folded(variables)

        def loss_k(w, s, b):
            return jnp.sum(_fused_stem(images, w, s, b, True).astype(jnp.float32) ** 2)

        def loss_r(w, s, b):
            return jnp.sum(
                stem_reference_xla(images, w, s, b).astype(jnp.float32) ** 2
            )

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(w7, scale, bias)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(w7, scale, bias)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=2.0, rtol=0.05,
            )

    def test_gradients_under_jit(self, stem_setup):
        """The custom VJP must differentiate UNDER JIT too: a traced init
        value in the reference maxpool once demoted reduce_window to the
        generic (non-differentiable) form, which only surfaced when the
        Trainer jitted the fused-stem train step (eager grad worked)."""
        images, variables = stem_setup
        w7, scale, bias = _folded(variables)

        def loss_k(w, s, b):
            return jnp.sum(_fused_stem(images, w, s, b, True).astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(w7, scale, bias)
        assert all(np.all(np.isfinite(np.asarray(x, np.float32))) for x in g)

    def test_shape_gating(self):
        assert fused_stem_supported((2, 64, 96, 3))
        assert fused_stem_supported((16, 800, 1344, 3))
        assert not fused_stem_supported((2, 60, 96, 3))  # H % 32 != 0
        assert not fused_stem_supported((2, 64, 98, 3))  # W % 4 != 0
        assert not fused_stem_supported((2, 64, 96, 12))  # packed channels
        assert not fused_stem_supported((64, 96, 3))

    def test_sharded_stem_matches_direct(self, stem_setup):
        """shard_map over the batch axis must be bit-equivalent to the direct
        kernel call (the grid is per-image; splitting the batch across
        devices changes nothing per image)."""
        from pytorch_retinanet_tpu.parallel.sharding import (
            make_inference_mesh,
            make_sharded_stem,
        )

        rng = np.random.default_rng(4)
        images = jnp.asarray(rng.random((4, 64, 96, 3), np.float32))
        module = RetinaNetModule(backbone_kind="resnet18", num_classes=5)
        variables = module.init(jax.random.PRNGKey(0), images)
        plan = make_inference_mesh(data=4)
        direct = fused_stem(
            variables, images, mean=module.mean, std=module.std, interpret=True
        )
        sharded = make_sharded_stem(module, plan.mesh, interpret=True)(
            variables, images
        )
        np.testing.assert_array_equal(
            np.asarray(sharded, np.float32), np.asarray(direct, np.float32)
        )

    def test_sharded_stem_gradients(self, stem_setup):
        """The custom VJP must transpose through shard_map (multi-chip
        freeze_bn training with the fast stem)."""
        from pytorch_retinanet_tpu.parallel.sharding import (
            make_inference_mesh,
            make_sharded_stem,
        )

        rng = np.random.default_rng(5)
        images = jnp.asarray(rng.random((2, 64, 96, 3), np.float32))
        module = RetinaNetModule(backbone_kind="resnet18", num_classes=5)
        variables = module.init(jax.random.PRNGKey(0), images)
        plan = make_inference_mesh(data=2)
        stem_fn = make_sharded_stem(module, plan.mesh, interpret=True)

        def loss_sharded(v):
            return jnp.sum(stem_fn(v, images).astype(jnp.float32) ** 2)

        def loss_direct(v):
            return jnp.sum(
                fused_stem(
                    v, images, mean=module.mean, std=module.std, interpret=True
                ).astype(jnp.float32)
                ** 2
            )

        gs = jax.grad(loss_sharded)(variables)
        gd = jax.grad(loss_direct)(variables)
        ks = np.asarray(
            gs["params"]["backbone"]["stem_conv"]["kernel"], np.float32
        )
        kd = np.asarray(
            gd["params"]["backbone"]["stem_conv"]["kernel"], np.float32
        )
        assert np.abs(ks).max() > 0  # actually flowed
        # per-shard backward recompute sums in a different order than the
        # whole-batch VJP: bf16 tolerance, same band as the direct-vs-XLA
        # gradient test above
        np.testing.assert_allclose(ks, kd, atol=4.0, rtol=0.06)

    def test_sharded_stem_gate(self, monkeypatch):
        from pytorch_retinanet_tpu.parallel.sharding import (
            make_inference_mesh,
            sharded_stem_applicable,
        )
        import pytorch_retinanet_tpu.kernels as kernels

        monkeypatch.setattr(kernels, "tpu_available", lambda: True)
        module = RetinaNetModule(backbone_kind="resnet18", num_classes=3)
        dp = make_inference_mesh(data=4)
        assert sharded_stem_applicable(module, (8, 64, 96, 3), dp.mesh)
        # batch must divide the data axis
        assert not sharded_stem_applicable(module, (6, 64, 96, 3), dp.mesh)
        # height-sharded images: partial rows — kernel illegal
        sp = make_inference_mesh(data=2, spatial=2)
        assert not sharded_stem_applicable(module, (8, 64, 96, 3), sp.mesh)
        # model axis alone is fine (redundant recompute)
        tp = make_inference_mesh(data=2, model=2)
        assert sharded_stem_applicable(module, (8, 64, 96, 3), tp.mesh)
        # non-bf16 module / s2d stem disqualify
        f32 = RetinaNetModule(
            backbone_kind="resnet18", num_classes=3, dtype=jnp.float32
        )
        assert not sharded_stem_applicable(f32, (8, 64, 96, 3), dp.mesh)
        s2d = RetinaNetModule(
            backbone_kind="resnet18", num_classes=3, stem_s2d=True
        )
        assert not sharded_stem_applicable(s2d, (8, 64, 96, 3), dp.mesh)
        # off-TPU: gate closed
        monkeypatch.setattr(kernels, "tpu_available", lambda: False)
        assert not sharded_stem_applicable(module, (8, 64, 96, 3), dp.mesh)

    def test_apply_detector_mesh_wiring(self, monkeypatch):
        """apply_detector(mesh=) end-to-end on the 8-device CPU mesh: the
        sharded stem path must produce the standard forward's logits
        (interpret-mode kernel forced via the patched factory)."""
        import functools

        import pytorch_retinanet_tpu.kernels as kernels
        import pytorch_retinanet_tpu.parallel.sharding as sharding
        from pytorch_retinanet_tpu.models.retinanet import apply_detector
        from pytorch_retinanet_tpu.parallel.sharding import make_inference_mesh

        monkeypatch.setattr(kernels, "tpu_available", lambda: True)
        monkeypatch.setattr(
            sharding,
            "make_sharded_stem",
            functools.partial(sharding.make_sharded_stem, interpret=True),
        )
        rng = np.random.default_rng(6)
        images = jnp.asarray(rng.random((4, 64, 96, 3), np.float32))
        module = RetinaNetModule(backbone_kind="resnet18", num_classes=5)
        variables = module.init(jax.random.PRNGKey(0), images)
        plan = make_inference_mesh(data=4)
        cls_ref, box_ref = module.apply(variables, images, False)
        cls_s, box_s = apply_detector(
            module, variables, images, mesh=plan.mesh
        )
        np.testing.assert_allclose(
            np.asarray(cls_s, np.float32), np.asarray(cls_ref, np.float32),
            atol=0.1, rtol=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(box_s, np.float32), np.asarray(box_ref, np.float32),
            atol=0.1, rtol=0.1,
        )

    def test_multi_device_gating(self, monkeypatch):
        """fused_stem_applicable must refuse a >1-device context even when
        the TPU/shape checks pass: pallas_call has no SPMD partitioning
        rule, so on a sharded mesh the kernel would replicate the global
        batch per device (ADVICE r2). The conftest provides 8 CPU devices;
        force the other gates open to isolate the device-count gate."""
        import pytorch_retinanet_tpu.kernels as kernels
        from pytorch_retinanet_tpu.models.retinanet import (
            fused_stem_applicable,
        )

        monkeypatch.setattr(kernels, "tpu_available", lambda: True)
        monkeypatch.setattr(kernels, "fused_stem_supported", lambda s: True)
        module = RetinaNetModule(backbone_kind="resnet18", num_classes=3)
        assert jax.device_count() == 8
        assert not fused_stem_applicable(module, (8, 64, 96, 3))
