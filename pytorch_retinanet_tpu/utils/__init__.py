"""Host-side utilities: telemetry, visualization, misc helpers.

Mirrors the reference's ``utils`` package exports (``utils/__init__.py:1-2``:
``collate_fn``, ``load_obj``, ``visualize_boxes_and_labels_on_image_array``) —
``collate_fn`` lives in the loader here (fixed-shape batches replaced ragged
tuples), and registry lookups replace ``load_obj``'s arbitrary dotted imports.
"""

from .metrics import MetricLogger, ProfilerHook, SmoothedValue
from .visualize import (
    STANDARD_COLORS,
    draw_bounding_box_on_image,
    visualize_boxes_and_labels_on_image_array,
)


def seed_everything(seed: int) -> int:
    """Deterministic seeding across python/numpy (pl.seed_everything parity,
    used by the reference demo notebook). JAX randomness is key-based, so the
    seed flows into PRNGKeys explicitly."""
    import os
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PL_GLOBAL_SEED"] = str(seed)
    return seed


__all__ = [
    "MetricLogger",
    "ProfilerHook",
    "STANDARD_COLORS",
    "SmoothedValue",
    "draw_bounding_box_on_image",
    "seed_everything",
    "visualize_boxes_and_labels_on_image_array",
]
