"""SP/TP inference sharding: sharded forwards must match single-device.

Exercises parallel.sharding's spatial ('spatial' axis: image height) and
tensor ('model' axis: conv output channels) partitioning on the virtual
8-device CPU mesh — GSPMD inserts the halo exchanges / channel collectives,
and the per-level head outputs must equal the replicated single-device
forward (f32 module so the comparison is reduction-order-tight only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_retinanet_tpu.models import RetinaNetModule
from pytorch_retinanet_tpu.parallel.sharding import (
    build_sharded_forward,
    make_inference_mesh,
    shard_variables,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


@pytest.fixture(scope="module")
def detector():
    module = RetinaNetModule(
        backbone_kind="resnet18",
        num_classes=4,
        freeze_bn=True,
        dtype=jnp.float32,  # exact-comparison dtype; prod path is bf16
    )
    images = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 128, 128, 3)).astype(np.float32)
    )
    variables = module.init(jax.random.PRNGKey(0), images[:1])
    return module, variables, images


@pytest.fixture(scope="module")
def reference_levels(detector):
    module, variables, images = detector
    cls_l, box_l = jax.jit(
        lambda v, x: module.apply(v, x, False, return_levels=True)
    )(variables, images)
    return (
        [np.asarray(c, np.float32) for c in cls_l],
        [np.asarray(b, np.float32) for b in box_l],
    )


def _assert_levels_match(got, want, atol=1e-4, rtol=1e-4):
    got_cls, got_box = got
    want_cls, want_box = want
    assert len(got_cls) == len(want_cls) == 5
    for lvl, (g, w) in enumerate(zip(got_cls, want_cls)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), w, atol=atol, rtol=rtol,
            err_msg=f"cls level {lvl}",
        )
    for lvl, (g, w) in enumerate(zip(got_box, want_box)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), w, atol=atol, rtol=rtol,
            err_msg=f"box level {lvl}",
        )


class TestMeshPlan:
    def test_shape_and_shardings(self):
        plan = make_inference_mesh(data=2, spatial=2, model=2)
        assert plan.num_devices == 8
        assert plan.axis_size("spatial") == 2
        spec = plan.image_sharding.spec
        assert spec == jax.sharding.PartitionSpec("data", "spatial", None, None)

    def test_too_few_devices_raises(self):
        with pytest.raises(ValueError):
            make_inference_mesh(data=16, spatial=1, model=1)

    def test_train_mesh_honors_data_at_spatial_one(self):
        """A sweep over spatial with fixed data= must keep the data axis at
        the spatial=1 point too, not silently widen to all devices."""
        from pytorch_retinanet_tpu.parallel import make_train_mesh

        plan = make_train_mesh(jax.devices(), spatial=1, data=2)
        assert plan.num_devices == 2
        assert plan.data_size == 2
        with pytest.raises(ValueError):
            make_train_mesh(jax.devices(), spatial=1, data=99)


class TestShardVariables:
    def test_kernels_shard_cout_when_divisible(self, detector):
        module, variables, _ = detector
        plan = make_inference_mesh(data=1, spatial=1, model=8)
        shardings = shard_variables(variables, plan.mesh)

        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        flat_s = jax.tree_util.tree_leaves(shardings)
        sharded = replicated = 0
        for (path, leaf), s in zip(flat, flat_s):
            name = getattr(path[-1], "key", "")
            if name == "kernel" and leaf.ndim == 4 and leaf.shape[-1] % 8 == 0:
                assert s.spec[-1] == "model", jax.tree_util.keystr(path)
                sharded += 1
            elif leaf.ndim >= 1 and leaf.shape[-1] % 8 != 0:
                # Non-divisible channels must replicate: the head predictors
                # (A*K = 9*4 = 36 channels here) and their biases.
                assert s.spec == jax.sharding.PartitionSpec(), (
                    jax.tree_util.keystr(path)
                )
                replicated += 1
        assert sharded > 10  # the backbone/FPN/head trunk kernels
        assert replicated >= 4  # cls/box predictor kernel + bias

    def test_size_one_axis_replicates_everything(self, detector):
        _, variables, _ = detector
        plan = make_inference_mesh(data=8, spatial=1, model=1)
        shardings = shard_variables(variables, plan.mesh)
        assert all(
            s.spec == jax.sharding.PartitionSpec()
            for s in jax.tree_util.tree_leaves(shardings)
        )


class TestShardedForwardParity:
    def test_spatial_partitioning(self, detector, reference_levels):
        module, variables, images = detector
        plan = make_inference_mesh(data=2, spatial=4, model=1)
        forward, place = build_sharded_forward(module, variables, plan)
        out = forward(place(images))
        _assert_levels_match(out, reference_levels)

    def test_spatial_uneven_and_empty_shards(self, detector):
        """UNEVEN C5 row divisions stay exact (regression for the guard's
        boundary): H=160 -> C5 has 5 rows; spatial=2 shards them (3,2)
        (uneven) and spatial=4 shards them (2,2,1,0) — one shard entirely
        GSPMD padding. Both measured exact vs single-device (max |delta|
        1.7e-6 f32); only rows < spatial corrupts, which place_images
        rejects."""
        module, variables, _ = detector
        images = jnp.asarray(
            np.random.default_rng(3)
            .normal(size=(1, 160, 160, 3))
            .astype(np.float32)
        )
        want = jax.jit(
            lambda v, x: module.apply(v, x, False, return_levels=True)
        )(variables, images)
        want = (
            [np.asarray(c, np.float32) for c in want[0]],
            [np.asarray(b, np.float32) for b in want[1]],
        )
        for spatial in (2, 4):
            plan = make_inference_mesh(data=1, spatial=spatial, model=1)
            forward, place = build_sharded_forward(module, variables, plan)
            _assert_levels_match(forward(place(images)), want)

    def test_tensor_parallel(self, detector, reference_levels):
        module, variables, images = detector
        plan = make_inference_mesh(data=1, spatial=1, model=8)
        forward, place = build_sharded_forward(module, variables, plan)
        out = forward(place(images))
        _assert_levels_match(out, reference_levels)

    def test_hybrid_dp_sp_tp(self, detector, reference_levels):
        module, variables, images = detector
        plan = make_inference_mesh(data=2, spatial=2, model=2)
        forward, place = build_sharded_forward(module, variables, plan)
        out = forward(place(images))
        _assert_levels_match(out, reference_levels)

    def test_detections_match_through_postprocess(self, detector):
        """Full predict parity: sharded logits through the (replicated)
        postprocess recover the same detections as the single-device path."""
        from pytorch_retinanet_tpu.ops import (
            generate_anchors_per_level,
            process_detections_multilevel_batch,
        )

        module, variables, images = detector
        hw = tuple(images.shape[1:3])
        anchors = [jnp.asarray(a) for a in generate_anchors_per_level(hw)]
        sizes = jnp.asarray([[128, 128], [128, 128]], jnp.int32)

        def post(levels):
            cls_l, box_l = levels
            return process_detections_multilevel_batch(
                list(cls_l), list(box_l), anchors, sizes,
                score_thres=0.05, nms_thres=0.5, max_detections=10,
            )

        ref_levels = jax.jit(
            lambda v, x: module.apply(v, x, False, return_levels=True)
        )(variables, images)
        ref = post(ref_levels)

        plan = make_inference_mesh(data=2, spatial=2, model=2)
        forward, place = build_sharded_forward(module, variables, plan)
        got = post(jax.device_get(forward(place(images))))

        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(ref.scores), atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(got.labels), np.asarray(ref.labels)
        )
        np.testing.assert_allclose(
            np.asarray(got.boxes), np.asarray(ref.boxes), atol=1e-2
        )
