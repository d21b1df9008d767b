"""Host-side detection data loader producing fixed-shape device batches.

TPU-native replacement for the reference's ``DataLoader(collate_fn=
tuple(zip(*batch)))`` (reference utils/detection_utils.py:7-9, wired at
model.py:92-110): instead of ragged python tuples, every batch is a dict of
static-shape numpy arrays ready for ``jax.device_put``:

    images      [B, H, W, 3] float32 in [0, 1] — padded resolution bucket
                (or uint8 raw bytes with ``image_dtype=np.uint8``: the model
                normalizes from bytes on device — 4x less host work/transfer)
    image_sizes [B, 2] float32 (resized h, w before padding)
    orig_sizes  [B, 2] float32 (pre-resize h, w)
    image_ids   [B] int64
    boxes       [B, MAX_GT, 4] float32 XYXY in resized coords
    labels      [B, MAX_GT] int32
    valid       [B, MAX_GT] bool
    batch_mask  [B] bool — False for padding rows appended to the final
                partial batch so every batch has the same static B (and stays
                divisible by the device-mesh size)

Design points (SURVEY.md §5.7, §2.3):
  * **Static shapes**: images are resized by the reference's shortest-side rule
    then padded into one of two orientation buckets, so XLA compiles at most
    two programs. Batches are grouped by bucket (aspect-ratio grouping, the
    role torchvision's GroupedBatchSampler plays for the reference): indices
    are partitioned landscape/portrait using dataset size metadata
    (``get_height_and_width``, no image decode), batched within each group,
    and the batch order is shuffled — so a mixed-orientation dataset never
    letterboxes a batch up to max×max (a third compiled program, +68% pixels).
  * **Ragged GT → padded GT**: boxes padded to ``max_gt`` with a validity mask
    (the matcher makes padding rows inert).
  * **Host parallelism**: a thread pool decodes/augments samples and a small
    prefetch queue overlaps host work with device steps (the reference uses
    DataLoader worker processes, hparams.yaml:43-46).
  * **Data parallelism**: ``shard`` / ``num_shards`` slice the dataset per
    host; batch size is the PER-HOST batch (global = B × hosts).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .. import config as C
from ..models.retinanet import resize_for_bucket, resize_to_bucket  # noqa: F401
from ..ops.boxes import rescale_boxes  # noqa: F401  (re-exported convenience)


def pad_targets(
    boxes: np.ndarray, labels: np.ndarray, max_gt: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad [N,4]/[N] GT to [max_gt] with a validity mask; excess boxes drop
    (with max_gt=100 this only affects pathological images; COCO p99 is ~40)."""
    n = min(len(boxes), max_gt)
    out_boxes = np.zeros((max_gt, 4), np.float32)
    out_labels = np.zeros((max_gt,), np.int32)
    out_valid = np.zeros((max_gt,), bool)
    out_boxes[:n] = boxes[:n]
    out_labels[:n] = labels[:n]
    out_valid[:n] = True
    return out_boxes, out_labels, out_valid


class DetectionLoader:
    """Iterable over fixed-shape batches from an (image, target, id) dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        min_size: int = C.MIN_IMAGE_SIZE,
        max_size: int = C.MAX_IMAGE_SIZE,
        max_gt: int = C.MAX_GT_BOXES,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        shard: int = 0,
        num_shards: int = 1,
        image_dtype=np.float32,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.min_size = min_size
        self.max_size = max_size
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.shard = shard
        self.num_shards = num_shards
        # uint8 keeps images as raw bytes end-to-end (decode → resize → pad →
        # batch → device); the model normalizes from bytes on device
        # (models.retinanet uint8 wire format). 4x less host memcpy +
        # host→device transfer than float32. Float-valued augmentations
        # quantize back to bytes under this option — use float32 (default)
        # when exact float augmentation output matters. "auto" resolves from
        # the first post-transform sample: byte-preserving pipelines (pure
        # geometric augs, data/transforms.py uint8_exact) get the uint8 wire
        # for free, float pipelines keep float32 exactly as before.
        self.image_dtype = (
            None if image_dtype == "auto" else np.dtype(image_dtype)
        )
        self.epoch = 0
        self._group_ids: Optional[np.ndarray] = None  # lazy, per-dataset-index

    # ------------------------------------------------------------------ #
    # Aspect-ratio (orientation) grouping
    def _groups(self) -> np.ndarray:
        """Orientation bucket per dataset index: 0 = portrait (h >= w, matches
        resize_to_bucket's rule), 1 = landscape, -1 = unknown (no metadata).
        Computed once from size metadata; never decodes an image."""
        if self._group_ids is None:
            n = len(self.dataset)
            ids = np.full(n, -1, np.int8)
            get_hw = getattr(self.dataset, "get_height_and_width", None)
            if get_hw is not None:
                for i in range(n):
                    hw = get_hw(i)
                    if hw is not None:
                        h, w = hw
                        ids[i] = 0 if h >= w else 1
            self._group_ids = ids
        return self._group_ids

    def _shard_batch_count(self, shard: int) -> int:
        """Batch count a given shard will produce (before cross-shard
        equalization) — deterministic, so every process can compute every
        shard's count without communication."""
        idxs = list(range(shard, len(self.dataset), self.num_shards))
        groups = self._groups()[idxs] if idxs else np.zeros(0, np.int8)
        total = 0
        for g in np.unique(groups):
            n = int((groups == g).sum())
            total += n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        return total

    def __len__(self) -> int:
        if self.num_shards > 1:
            # equalized across shards — see _batched_indices
            return max(
                self._shard_batch_count(s) for s in range(self.num_shards)
            )
        return self._shard_batch_count(self.shard)

    # ------------------------------------------------------------------ #
    def _load_sample(self, idx: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        # Per-sample generator keyed on (seed, epoch, index): augmentation is
        # bit-reproducible regardless of thread-pool scheduling order (the
        # reference's global-`random` DataLoader workers are not).
        if hasattr(self.dataset, "get_sample"):
            rng = np.random.default_rng([self.seed, epoch, idx])
            image, target, image_id = self.dataset.get_sample(idx, rng)
        else:
            image, target, image_id = self.dataset[idx]
        wire = self.image_dtype
        if wire is None:  # "auto": bytes stay bytes, floats stay float32.
            # Benign race under the thread pool: every thread resolves the
            # same value (sample dtype is uniform across a dataset).
            wire = np.dtype(np.uint8 if image.dtype == np.uint8 else np.float32)
            self.image_dtype = wire
        orig_h, orig_w = image.shape[:2]
        # Resize WITHOUT padding: _collate writes the resized image straight
        # into the batch buffer, skipping a per-sample full-bucket
        # zeros+copy (was ~25% of f32 sample prep, LOADER.json round 5).
        resized, (new_h, new_w), _, bucket = resize_for_bucket(
            image, self.min_size, self.max_size, wire_dtype=wire
        )
        boxes = np.asarray(target["boxes"], np.float32).reshape(-1, 4)
        if len(boxes):
            scale_y, scale_x = new_h / orig_h, new_w / orig_w
            boxes = boxes * np.array(
                [scale_x, scale_y, scale_x, scale_y], np.float32
            )
        labels = np.asarray(target["labels"], np.int64)
        pboxes, plabels, pvalid = pad_targets(boxes, labels, self.max_gt)
        return {
            "image": resized,
            "bucket": bucket,
            "image_size": np.asarray([new_h, new_w], np.float32),
            "orig_size": np.asarray([orig_h, orig_w], np.float32),
            "image_id": np.int64(image_id),
            "boxes": pboxes,
            "labels": plabels,
            "valid": pvalid,
        }

    def _batched_indices(self) -> List[Tuple[List[int], bool]]:
        """Shard → shuffle → partition by orientation group → batch within
        each group → shuffle batch order. At most one partial batch per group
        (2-3 per epoch); with drop_last they are dropped, with pad_last they
        pad to the static batch size like before.

        Returns (indices, is_filler) pairs. Multi-shard, every shard pads up
        to the MAX batch count across shards with repeated "filler" batches
        (orientation grouping makes per-shard counts unequal, and unequal
        counts desynchronize the lockstep SPMD collectives — the
        DistributedSampler problem). Fillers repeat real batches; in
        eval/test/predict their batch_mask is all-False so they contribute
        nothing, in training they are ordinary duplicate batches (the same
        semantics as DistributedSampler's padded samples).
        """
        idxs = list(range(self.shard, len(self.dataset), self.num_shards))
        rng = np.random.default_rng(self.seed + self.epoch)
        if self.shuffle:
            rng.shuffle(idxs)
        group_ids = self._groups()
        by_group: Dict[int, List[int]] = {}
        for i in idxs:
            by_group.setdefault(int(group_ids[i]), []).append(i)
        batches: List[Tuple[List[int], bool]] = []
        for g in sorted(by_group):
            members = by_group[g]
            batches.extend(
                (members[i : i + self.batch_size], False)
                for i in range(0, len(members), self.batch_size)
            )
        if self.drop_last:
            batches = [b for b in batches if len(b[0]) == self.batch_size]
        if self.num_shards > 1:
            target = max(
                self._shard_batch_count(s) for s in range(self.num_shards)
            )
            if not batches and target > 0 and len(self.dataset):
                batches = [([0], True)]  # empty shard: all-filler
            k = 0
            while batches and len(batches) < target:
                batches.append((batches[k % len(batches)][0], True))
                k += 1
        if self.shuffle:
            rng.shuffle(batches)
        return batches

    def _collate(
        self, samples: Sequence[Dict[str, np.ndarray]], is_filler: bool = False
    ) -> Dict[str, np.ndarray]:
        # Batches are orientation-homogeneous (see _batched_indices), so the
        # max-over-buckets is a no-op for grouped data; it only letterboxes
        # mixed batches from datasets without size metadata (group -1), the
        # same pad-to-max behavior torchvision applies to every batch.
        # Samples carry UNPADDED resized images + their bucket: the one
        # zeros+write here is the only full-frame materialization per image.
        n_real = len(samples)
        n_total = self.batch_size if (self.pad_last and n_real < self.batch_size) else n_real
        max_h = max(s["bucket"][0] for s in samples)
        max_w = max(s["bucket"][1] for s in samples)
        images = np.zeros((n_total, max_h, max_w, 3), samples[0]["image"].dtype)
        for i, s in enumerate(samples):
            h, w = s["image"].shape[:2]
            images[i, :h, :w] = s["image"]

        def stack_padded(key, fill=0):
            arr = np.stack([s[key] for s in samples])
            if n_total > n_real:
                pad = np.full((n_total - n_real, *arr.shape[1:]), fill, arr.dtype)
                # image_sizes of padding rows must stay nonzero for safe division
                if key in ("image_size", "orig_size"):
                    pad[:] = arr[-1]
                arr = np.concatenate([arr, pad])
            return arr

        batch_mask = np.zeros(n_total, bool)
        if not is_filler:  # cross-shard filler batches count for nothing
            batch_mask[:n_real] = True
        return {
            "images": images,
            "image_sizes": stack_padded("image_size"),
            "orig_sizes": stack_padded("orig_size"),
            "image_ids": np.concatenate(
                [
                    np.asarray([s["image_id"] for s in samples], np.int64),
                    np.full(n_total - n_real, -1, np.int64),
                ]
            ),
            "boxes": stack_padded("boxes"),
            "labels": stack_padded("labels"),
            "valid": stack_padded("valid"),
            "batch_mask": batch_mask,
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = self.epoch
        batches = self._batched_indices()
        self.epoch += 1
        if not batches:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that re-checks `stop`, so an early-exiting consumer
            (max_steps break, exception) can't leave the producer parked in
            q.put() forever, leaking the thread pool."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idxs, is_filler in batches:
                        if stop.is_set():
                            return
                        samples = list(
                            pool.map(lambda i: self._load_sample(i, epoch), batch_idxs)
                        )
                        if not put_or_stop(self._collate(samples, is_filler=is_filler)):
                            return
            except BaseException as e:  # noqa: BLE001
                # A worker exception (bad image path, corrupt file, transform
                # bug) must surface in the CONSUMER — without this the
                # producer thread dies silently and the consumer blocks in
                # q.get() forever (torch DataLoader similarly re-raises
                # worker exceptions in the main process).
                put_or_stop(e)
                return
            put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
