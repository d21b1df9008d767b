"""Training telemetry: smoothed meters, step logging, profiler hooks.

Rebuild of the reference's metric utilities (``utils/coco/detection_utils.py:
14-74`` ``SmoothedValue``, ``:149-230`` ``MetricLogger``) — there they are
vestigial (never called from the Lightning path, SURVEY.md §5.1); here they are
the live telemetry for the Trainer: windowed medians/averages, images/sec,
ETA, and optional ``jax.profiler`` traces (the TPU-native substitute for
``torch.cuda.max_memory_allocated`` at detection_utils.py:220-224).
"""

from __future__ import annotations

import datetime
import logging
import time
from collections import defaultdict
from typing import Dict, Iterable, Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)


class SmoothedValue:
    """Windowed scalar meter: stats over the last `window_size` updates plus
    lifetime totals (the role of the reference's SmoothedValue,
    detection_utils.py:14-74, itself from the torchvision references).

    Own design: a fixed numpy ring buffer with a cursor instead of a deque —
    window statistics are one vectorized call over a buffer slice, and there
    is no dist-sync machinery (under SPMD the metrics leaving the jitted step
    are already globally reduced).
    """

    __slots__ = ("_ring", "_cursor", "_filled", "_lifetime_sum", "_lifetime_n", "fmt")

    def __init__(
        self, window_size: int = 20, fmt: str = "{median:.4f} (avg {global_avg:.4f})"
    ):
        self._ring = np.zeros(max(1, window_size), np.float64)
        self._cursor = 0
        self._filled = 0
        self._lifetime_sum = 0.0
        self._lifetime_n = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self._ring[self._cursor] = value
        self._cursor = (self._cursor + 1) % self._ring.size
        self._filled = min(self._filled + 1, self._ring.size)
        self._lifetime_sum += float(value) * n
        self._lifetime_n += n

    def _window(self) -> np.ndarray:
        return self._ring[: self._filled]

    @property
    def median(self) -> float:
        w = self._window()
        return float(np.median(w)) if w.size else 0.0

    @property
    def avg(self) -> float:
        w = self._window()
        return float(w.mean()) if w.size else 0.0

    @property
    def global_avg(self) -> float:
        return self._lifetime_sum / max(self._lifetime_n, 1)

    @property
    def max(self) -> float:
        w = self._window()
        return float(w.max()) if w.size else 0.0

    @property
    def value(self) -> float:
        """Most recent update (one slot behind the cursor)."""
        if not self._filled:
            return 0.0
        return float(self._ring[(self._cursor - 1) % self._ring.size])

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    """Iteration logger with ETA + data/step timing (reference MetricLogger,
    detection_utils.py:149-230)."""

    def __init__(self, delimiter: str = "  ", print_freq: int = 50):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_freq = print_freq

    def update(self, **kwargs: float) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr: str) -> SmoothedValue:
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(
        self, iterable: Iterable, header: str = "", total: Optional[int] = None
    ) -> Iterator:
        total = total if total is not None else (
            len(iterable) if hasattr(iterable, "__len__") else None
        )
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        start = time.time()
        end = start
        for i, obj in enumerate(iterable):
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            end = time.time()
            if i % self.print_freq == 0 or (total and i == total - 1):
                eta = (
                    str(datetime.timedelta(seconds=int(iter_time.global_avg * (total - i))))
                    if total
                    else "?"
                )
                logger.info(
                    "%s [%d%s] eta: %s %s time: %s data: %s",
                    header, i, f"/{total}" if total else "", eta,
                    str(self), str(iter_time), str(data_time),
                )
        logger.info(
            "%s done in %s", header,
            str(datetime.timedelta(seconds=int(time.time() - start))),
        )


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in MiB (TPU substitute for the reference's
    ``torch.cuda.max_memory_allocated`` telemetry, detection_utils.py:220-224).

    Returns {} on backends that don't expose memory stats (e.g. CPU).
    """
    import jax

    out: Dict[str, float] = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats and "bytes_in_use" in stats:
            out[f"{d.platform}{d.id}_mb"] = round(stats["bytes_in_use"] / 2**20, 1)
            if "peak_bytes_in_use" in stats:
                out[f"{d.platform}{d.id}_peak_mb"] = round(
                    stats["peak_bytes_in_use"] / 2**20, 1
                )
    return out


class ProfilerHook:
    """jax.profiler trace around a step range (SURVEY.md §5.1 TPU substitute
    for the reference's CUDA memory telemetry)."""

    def __init__(self, log_dir: Optional[str], start_step: int = 10, num_steps: int = 5):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def step(self, step: int) -> None:
        if not self.log_dir:
            return
        import jax

        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
