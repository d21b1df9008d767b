"""Device-mesh parallelism: sharding specs, collectives, distributed init.

TPU-native replacement for the reference's torch.distributed/NCCL layer
(``utils/coco/detection_utils.py:77-146, 255-327``), rebuilt on
``jax.sharding`` (SURVEY.md §2.3, §5.8):

* the train step is jitted over a ``Mesh`` with a ``data`` axis — the batch is
  sharded across devices, parameters/optimizer state are replicated, and XLA
  inserts the gradient ``psum`` over ICI automatically (no hand-written
  all-reduce, unlike the reference's ``reduce_dict``).
* eval-shard merging (the reference's pickle-over-NCCL ``all_gather``,
  detection_utils.py:77-119) becomes either fixed-shape array all-gathers on
  device or host-side object gathers via ``jax.experimental.multihost_utils``.
* process-group bootstrap (reference ``init_distributed_mode``,
  detection_utils.py:300-327, env:// + SLURM) maps onto
  ``jax.distributed.initialize``, which reads the same style of cluster env.

The mesh axis layout is extensible: training uses ``("data",)`` (the
reference is data-parallel-only, SURVEY.md §2.3, so parity needs exactly
this), and :mod:`.sharding` adds the beyond-parity inference axes — a
``(data, spatial, model)`` mesh with GSPMD spatial partitioning of the image
height and tensor-parallel conv channels.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import (  # noqa: F401  (re-exported surface)
    InferenceMeshPlan,
    build_sharded_forward,
    make_inference_mesh,
    shard_variables,
)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (replaces reference init_distributed_mode,
    detection_utils.py:300-327). No-ops gracefully single-process, like the
    reference's early-return when env vars are missing."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def get_world_size() -> int:
    """Reference get_world_size (detection_utils.py:279-283)."""
    return jax.process_count()


def get_rank() -> int:
    """Reference get_rank (detection_utils.py:286-289)."""
    return jax.process_index()


def is_main_process() -> bool:
    """Reference is_main_process (detection_utils.py:292-293)."""
    return jax.process_index() == 0


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """A device mesh plus the canonical shardings the engine uses.

    1-D ``("data",)`` for plain data parallelism (:func:`make_mesh`), or 2-D
    ``("data", "spatial")`` for spatial-parallel TRAINING
    (:func:`make_train_mesh`): image height sharded across 'spatial', GSPMD
    conv halo exchanges through the backbone, features gathered before the
    FPN/head/loss (engine.trainer picks the split forward when
    ``spatial_size > 1``).
    """

    mesh: Mesh

    @property
    def data_sharding(self) -> NamedSharding:
        """Batch arrays: sharded on the leading (batch) axis over 'data'."""
        return NamedSharding(self.mesh, P("data"))

    @property
    def image_sharding(self) -> NamedSharding:
        """NHWC images: batch over 'data', height over 'spatial' (if any)."""
        if self.spatial_size > 1:
            return NamedSharding(self.mesh, P("data", "spatial"))
        return self.data_sharding

    @property
    def replicated(self) -> NamedSharding:
        """Params / optimizer state: replicated everywhere."""
        return NamedSharding(self.mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    @property
    def data_size(self) -> int:
        """Devices along 'data' — the batch divisibility requirement."""
        return self.mesh.shape.get("data", self.num_devices)

    @property
    def spatial_size(self) -> int:
        return self.mesh.shape.get("spatial", 1)

    def shard_batch(self, batch):
        """Device-put a host batch dict with the batch axis sharded over
        'data' ('images' additionally shard height over 'spatial' when the
        mesh has that axis).

        Multi-process: each host passes its PER-HOST batch and the global
        array is assembled across hosts (global batch = local × hosts) via
        ``jax.make_array_from_process_local_data`` — the ICI/DCN analog of
        the reference's DDP per-rank batches."""

        def sharding_for(key, x) -> NamedSharding:
            if key != "images" or self.spatial_size <= 1:
                return self.data_sharding
            # >= 1 C5 row per spatial shard, or GSPMD's sub-row conv
            # partitioning corrupts the pyramid (parallel/sharding.py's
            # _DEEPEST_STRIDE note; uneven divisions are measured exact).
            # np.shape reads metadata only — no device→host copy when the
            # batch is already device-resident.
            from .sharding import _DEEPEST_STRIDE

            height = int(np.shape(x)[1])
            rows = height // _DEEPEST_STRIDE
            if rows < self.spatial_size:
                raise ValueError(
                    f"spatial axis {self.spatial_size} too large for image "
                    f"height {height}: C5 has {rows} rows and "
                    "each spatial shard needs >= 1"
                )
            return self.image_sharding

        if jax.process_count() > 1:
            return {
                k: jax.make_array_from_process_local_data(
                    sharding_for(k, v), np.asarray(v)
                )
                for k, v in batch.items()
            }
        return {
            k: jax.device_put(v, sharding_for(k, v)) for k, v in batch.items()
        }


def make_mesh(
    devices: Optional[Sequence[Any]] = None, axis_name: str = "data"
) -> MeshPlan:
    """Build a 1-D data-parallel mesh over all local+addressable devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return MeshPlan(Mesh(devs.reshape(-1), (axis_name,)))


def make_train_mesh(
    devices: Optional[Sequence[Any]] = None,
    *,
    spatial: int = 1,
    data: Optional[int] = None,
) -> MeshPlan:
    """A ``(data, spatial)`` training mesh: batch over 'data', image height
    over 'spatial'.

    Spatial-parallel training spreads ONE image's backbone FLOPs and
    activation memory over ``spatial`` devices (GSPMD halo exchanges over
    ICI) — the lever for training at higher resolution per chip than fits
    data-parallel, where remat is the only (measured slower,
    docs/ROOFLINE_TRAIN.md) alternative. ``data`` defaults to the remaining
    devices. Requires ``freeze_bn`` training (the default, and the
    reference's: batch statistics never update) — the Trainer enforces this.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    if spatial <= 1:
        # Honor an explicit data= here too (a sweep over spatial with fixed
        # data must not silently widen to all devices at spatial=1).
        if data is not None:
            if data < 1 or devs.size < data:
                raise ValueError(
                    f"data axis {data} needs {data} devices, have {devs.size}"
                )
            return make_mesh(devs.flatten()[:data])
        return make_mesh(devs)
    if data is None:
        data = devs.size // spatial
    need = data * spatial
    if data < 1 or devs.size < need:
        raise ValueError(
            f"mesh {data}x{spatial} needs {need} devices, have {devs.size}"
        )
    return MeshPlan(
        Mesh(devs.flatten()[:need].reshape(data, spatial), ("data", "spatial"))
    )


def local_rows(tree: Any) -> Any:
    """THIS process's rows of data-sharded global outputs (numpy).

    ``MeshPlan.shard_batch`` assembles per-host batches into a global array
    (global batch = local x hosts); step outputs inherit that sharding, so a
    multi-host process can neither ``device_get`` the full array (not fully
    addressable) nor index it with local-batch row numbers. This inverse
    gathers the process's addressable shards in global-row order — exactly
    the local batch rows it contributed, in their original order.
    Single-process it is just ``device_get``.
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
    return jax.tree_util.tree_map(_local_rows_leaf, tree)


def _local_rows_leaf(arr) -> np.ndarray:
    """One leaf of :func:`local_rows`: this process's rows in global order.

    Batch-sharded leaves concatenate addressable shards by leading-axis
    offset; scalars and replicated leaves (every shard holds the same full
    value) return a single copy instead of duplicating per local device."""
    shards = list(getattr(arr, "addressable_shards", []))
    if getattr(arr, "ndim", 0) == 0 or len(shards) <= 1:
        return np.asarray(shards[0].data) if shards else np.asarray(arr)
    starts = [(s.index[0].start or 0) if s.index else 0 for s in shards]
    if len(set(starts)) == 1:
        first = shards[0].data
        if tuple(first.shape) != tuple(arr.shape):
            # Equal leading-axis offsets but shard != global shape means the
            # leaf is sharded on a NON-leading axis — returning one shard
            # would silently drop the other columns (found by review).
            raise ValueError(
                "local_rows requires leaves replicated or sharded on the "
                f"leading axis; got shard shape {tuple(first.shape)} vs "
                f"global {tuple(arr.shape)}"
            )
        return np.asarray(first)  # fully replicated
    # Leading-axis sharded; keep ONE shard per distinct row offset so a
    # partially-replicated layout (e.g. starts [0, 0, 4, 4]) does not
    # duplicate rows.
    by_start: dict = {}
    for i, st in enumerate(starts):
        by_start.setdefault(st, i)
    order = [by_start[st] for st in sorted(by_start)]
    return np.concatenate([np.asarray(shards[i].data) for i in order], axis=0)


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather arbitrary python objects from every process (reference
    all_gather, detection_utils.py:77-119 — pickle over NCCL). Single-process
    returns ``[obj]`` exactly like the reference's world_size==1 early-return.

    Multi-host, this uses jax's global broadcast utilities; the hot path
    (detections) should use fixed-shape device all-gathers instead — this is
    only for small eval-result merges.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # Round 1: exchange sizes (fixed shape), round 2: pad to max then gather —
    # the same size-padded protocol as the reference (detection_utils.py:88-111).
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64)
    ).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(gathered.shape[0])
    ]


def reduce_dict(metrics: dict, average: bool = True) -> dict:
    """Average (or sum) a dict of scalars across PROCESSES (reference
    reduce_dict, detection_utils.py:122-146 — all-reduce over NCCL ranks).

    Under jit the loss psum already happens inside the train step across
    devices; this is the host-side cross-process reduction for materialized
    scalars. Single-process it reduces to an unwrap, like the reference's
    world_size < 2 early-return."""
    local = {k: float(np.asarray(v).mean()) for k, v in metrics.items()}
    if jax.process_count() == 1:
        return local
    shards = all_gather_objects(local)
    out: dict = {}
    for k in local:
        total = sum(s[k] for s in shards)
        out[k] = total / len(shards) if average else total
    return out
