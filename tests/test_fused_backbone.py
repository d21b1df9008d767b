"""Fused identity-bottleneck kernel + kernel-fused trunk parity.

Three layers of cross-checks, mirroring the stem kernel's test strategy
(tests/test_stem_kernel.py):
  1. the Pallas kernel (interpret mode) against the XLA composition it fuses;
  2. the XLA block interpreter (fused_backbone._xla_bottleneck) and the full
     fused-trunk assembler against the flax ResNetBackbone module — same
     variables, same frozen-BN inference semantics;
  3. gradients through the custom VJP (the frozen-BN train path), under jit.
Compiled-on-TPU parity is covered by tools/tpu_selfcheck.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_retinanet_tpu.kernels import (
    bottleneck_reference_xla,
    fused_bottleneck_supported,
)
from pytorch_retinanet_tpu.kernels.bottleneck_pallas import _fused_bottleneck
from pytorch_retinanet_tpu.models import ResNetBackbone
from pytorch_retinanet_tpu.models.fused_backbone import (
    apply_trunk_fused,
    fused_trunk_applicable,
)


def rand_block(rng, cin, mid):
    w1 = rng.normal(0, 0.05, (1, 1, cin, mid)).astype(np.float32)
    w2 = rng.normal(0, 0.05, (3, 3, mid, mid)).astype(np.float32)
    w3 = rng.normal(0, 0.05, (1, 1, mid, cin)).astype(np.float32)
    vec = lambda lo, hi, n: rng.uniform(lo, hi, n).astype(np.float32)  # noqa: E731
    return (
        jnp.asarray(w1), jnp.asarray(vec(0.5, 1.5, mid)), jnp.asarray(vec(-0.2, 0.2, mid)),
        jnp.asarray(w2), jnp.asarray(vec(0.5, 1.5, mid)), jnp.asarray(vec(-0.2, 0.2, mid)),
        jnp.asarray(w3), jnp.asarray(vec(0.5, 1.5, cin)), jnp.asarray(vec(-0.2, 0.2, cin)),
    )


class TestKernelVsXla:
    @pytest.mark.parametrize("h,w,cin,mid", [(8, 24, 256, 64), (10, 12, 512, 128), (10, 84, 1024, 256), (5, 21, 256, 64)])
    def test_interpret_matches_reference(self, h, w, cin, mid):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (2, h, w, cin)).astype(np.float32))
        args = rand_block(rng, cin, mid)
        ref = np.asarray(bottleneck_reference_xla(x, *args), np.float32)
        got = np.asarray(_fused_bottleneck(x, *args, True), np.float32)
        # bf16 outputs: tolerance is one bf16 ulp at the activation scale
        # (kernel and reference round intermediates at different points)
        tol = 0.04 * max(float(np.abs(ref).max()), 1.0)
        np.testing.assert_allclose(got, ref, atol=tol, rtol=0.05)
        # relu floor: a healthy fraction of exact zeros must agree
        assert ((ref == 0) == (got == 0)).mean() > 0.98

    def test_supported_gate(self):
        assert fused_bottleneck_supported((2, 16, 24, 512), 128)
        # mid=64 (layer1): measured slower than XLA end-to-end — gated off
        assert not fused_bottleneck_supported((2, 16, 24, 256), 64)
        assert not fused_bottleneck_supported((2, 16, 24, 512), 256)  # C != 4*mid
        assert not fused_bottleneck_supported((2, 16, 24), 128)
        assert fused_trunk_applicable("resnet50")
        assert not fused_trunk_applicable("resnet18")

    def test_gradients_under_jit(self):
        """Custom VJP (XLA recompute) must differentiate under jit and match
        grads through the reference composition."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 24, 256)).astype(np.float32))
        args = rand_block(rng, 256, 64)

        def loss_k(*a):
            return jnp.sum(_fused_bottleneck(x, *a, True).astype(jnp.float32) ** 2)

        def loss_r(*a):
            return jnp.sum(bottleneck_reference_xla(x, *a).astype(jnp.float32) ** 2)

        gk = jax.jit(jax.grad(loss_k, argnums=tuple(range(9))))(*args)
        gr = jax.jit(jax.grad(loss_r, argnums=tuple(range(9))))(*args)
        for a, b in zip(gk, gr):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            # cotangents flow through the bf16 forward → scale-aware bound
            tol = 0.03 * max(float(np.abs(b).max()), 1.0)
            np.testing.assert_allclose(a, b, atol=tol, rtol=0.05)


class TestFusedTrunkVsModule:
    @pytest.fixture(scope="class")
    def setup(self):
        backbone = ResNetBackbone(kind="resnet50", freeze_bn=True)
        rng = np.random.default_rng(2)
        images = jnp.asarray(rng.uniform(-2, 2, (1, 64, 96, 3)).astype(np.float32))
        variables = backbone.init(jax.random.PRNGKey(0), images)
        # Non-trivial running stats so the BN fold is load-bearing.
        stats = jax.tree_util.tree_map(lambda v: v, variables["batch_stats"])

        def perturb(path, v):
            # Mild perturbation: BN scales > 1 compound activations through
            # 16 blocks, and with them bf16 drift — keep the fold
            # load-bearing without exponential magnitude growth.
            # zlib.crc32, not hash(): str.__hash__ is salted per process,
            # which made the perturbation (and the tolerance margin it
            # exercises) different on every pytest run.
            import zlib

            key = jax.random.PRNGKey(zlib.crc32(str(path).encode()) % 2**31)
            if path[-1].key == "mean":
                return v + jax.random.normal(key, v.shape) * 0.05
            return v * jax.random.uniform(key, v.shape, minval=0.9, maxval=1.1)

        stats = jax.tree_util.tree_map_with_path(perturb, stats)
        variables = {"params": variables["params"], "batch_stats": stats}
        feats_mod = backbone.apply(variables, images, False)
        # The trunk interpreter consumes the stem output — reproduce it from
        # the module by capturing the maxpool input boundary: easiest is to
        # run the module stem ops directly.
        from pytorch_retinanet_tpu.kernels import stem_reference_xla

        p, s = variables["params"], variables["batch_stats"]
        bn_p = p["stem_bn"]["BatchNorm_0"]
        bn_s = s["stem_bn"]["BatchNorm_0"]
        scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
        bias = bn_p["bias"] - bn_s["mean"] * scale
        stem = stem_reference_xla(images, p["stem_conv"]["kernel"], scale, bias)
        return variables, stem, feats_mod

    def test_xla_interpreter_matches_module(self, setup):
        variables, stem, feats_mod = setup
        feats = apply_trunk_fused(variables, stem, "resnet50", use_pallas=False)
        for k in ("c3", "c4", "c5"):
            a = np.asarray(feats[k], np.float32)
            b = np.asarray(feats_mod[k], np.float32)
            tol = 0.02 * max(float(np.abs(b).max()), 1.0)  # bf16 depth drift
            np.testing.assert_allclose(a, b, atol=tol, rtol=0.05)

    def test_pallas_interpret_trunk_matches_module(self, setup):
        variables, stem, feats_mod = setup
        feats = apply_trunk_fused(
            variables, stem, "resnet50", use_pallas=True, interpret=True
        )
        for k in ("c3", "c4", "c5"):
            a = np.asarray(feats[k], np.float32)
            b = np.asarray(feats_mod[k], np.float32)
            tol = 0.02 * max(float(np.abs(b).max()), 1.0)
            np.testing.assert_allclose(a, b, atol=tol, rtol=0.05)

    def test_feats_in_path_through_module(self, setup):
        """RetinaNetModule must accept precomputed features and produce the
        same logits as the full forward."""
        from pytorch_retinanet_tpu.models.retinanet import RetinaNetModule

        module = RetinaNetModule(
            backbone_kind="resnet50", num_classes=4, dtype=jnp.float32
        )
        rng = np.random.default_rng(3)
        images = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
        variables = module.init(jax.random.PRNGKey(0), images)
        cls_a, box_a = module.apply(variables, images, False)
        # Recompute backbone features via the module, then feed feats_in.
        bb = ResNetBackbone(kind="resnet50", freeze_bn=True, dtype=jnp.float32)
        bvars = {
            "params": variables["params"]["backbone"],
            "batch_stats": variables["batch_stats"]["backbone"],
        }
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        feats = bb.apply(bvars, (images - mean) / std, False)
        cls_b, box_b = module.apply(variables, images, False, feats_in=feats)
        np.testing.assert_allclose(
            np.asarray(cls_a), np.asarray(cls_b), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(box_a), np.asarray(box_b), atol=1e-5, rtol=1e-5
        )


class TestKernelVariants:
    """Round-4 kernel variants (docs/ROOFLINE_BACKBONE.md follow-ups):
    dy-concat conv2 (3 deep GEMMs) and C-chunked conv3 — same math, measured
    on chip by tools/experiments/bottleneck_variants.py."""

    @pytest.mark.parametrize(
        "opts",
        [
            {"dy_concat": True},
            {"cout_chunk": 128},
            {"dy_concat": True, "cout_chunk": 128, "max_rows": 32,
             "vmem_budget": int(12.5 * 2**20)},
        ],
    )
    @pytest.mark.parametrize("h,w,cin,mid", [(8, 24, 256, 64), (10, 12, 512, 128)])
    def test_variant_interpret_matches_reference(self, h, w, cin, mid, opts):
        from pytorch_retinanet_tpu.kernels.bottleneck_pallas import (
            _fused_bottleneck_impl,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (2, h, w, cin)).astype(np.float32))
        args = rand_block(rng, cin, mid)
        ref = np.asarray(bottleneck_reference_xla(x, *args), np.float32)
        got = np.asarray(
            _fused_bottleneck_impl(x, *args, interpret=True, **opts), np.float32
        )
        tol = 0.04 * max(float(np.abs(ref).max()), 1.0)
        np.testing.assert_allclose(got, ref, atol=tol, rtol=0.05)
        assert ((ref == 0) == (got == 0)).mean() > 0.98
