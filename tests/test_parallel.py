"""Parallel utilities tests: mesh plans, shardings, gathers, rank helpers."""

import numpy as np
import pytest

import jax

from pytorch_retinanet_tpu.parallel import (
    MeshPlan,
    all_gather_objects,
    get_rank,
    get_world_size,
    init_distributed,
    is_main_process,
    make_mesh,
    reduce_dict,
)


class TestMeshPlan:
    def test_full_mesh_over_8_devices(self):
        plan = make_mesh()
        assert plan.num_devices == 8
        assert plan.mesh.axis_names == ("data",)

    def test_shard_batch_splits_leading_axis(self):
        plan = make_mesh()
        batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
        sharded = plan.shard_batch(batch)
        assert not sharded["x"].sharding.is_fully_replicated
        np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])

    def test_replicated_sharding(self):
        plan = make_mesh()
        x = jax.device_put(np.ones(4), plan.replicated)
        assert x.sharding.is_fully_replicated

    def test_submesh(self):
        plan = make_mesh(jax.devices()[:2])
        assert plan.num_devices == 2


class TestProcessHelpers:
    def test_single_process_defaults(self):
        assert get_world_size() == 1
        assert get_rank() == 0
        assert is_main_process()

    def test_init_distributed_noop_single(self):
        # must not raise / not attempt cluster init when world size <= 1
        init_distributed(num_processes=1)
        init_distributed(num_processes=None)

    def test_all_gather_objects_single_process(self):
        obj = {"dets": [1, 2, 3], "name": "shard0"}
        out = all_gather_objects(obj)
        assert out == [obj]  # reference's world_size==1 early-return semantics

    def test_reduce_dict(self):
        out = reduce_dict({"a": np.asarray([2.0, 4.0]), "b": 3.0})
        assert out == {"a": 3.0, "b": 3.0}


class TestLocalRowsLeaf:
    """_local_rows_leaf handles every leaf kind, not just batch-sharded ones
    (it is reachable through the public local_rows on multi-host trees that
    carry scalar losses or replicated params alongside sharded outputs)."""

    def test_batch_sharded_concat_in_order(self):
        from pytorch_retinanet_tpu.parallel import _local_rows_leaf

        plan = make_mesh()
        x = np.arange(16, dtype=np.float32).reshape(8, 2)
        sharded = jax.device_put(x, plan.data_sharding)
        np.testing.assert_array_equal(_local_rows_leaf(sharded), x)

    def test_replicated_leaf_single_copy(self):
        from pytorch_retinanet_tpu.parallel import _local_rows_leaf

        plan = make_mesh()
        x = np.arange(6, dtype=np.float32)
        rep = jax.device_put(x, plan.replicated)
        out = _local_rows_leaf(rep)
        np.testing.assert_array_equal(out, x)  # one copy, not 8 concatenated

    def test_scalar_leaf(self):
        from pytorch_retinanet_tpu.parallel import _local_rows_leaf

        plan = make_mesh()
        s = jax.device_put(np.float32(3.5), plan.replicated)
        assert float(_local_rows_leaf(s)) == 3.5
