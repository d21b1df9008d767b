"""Host-side utilities: telemetry, visualization, misc helpers.

Mirrors the reference's ``utils`` package exports (``utils/__init__.py:1-2``:
``collate_fn``, ``load_obj``, ``visualize_boxes_and_labels_on_image_array``) —
``collate_fn`` lives in the loader here (fixed-shape batches replaced ragged
tuples), and registry lookups replace ``load_obj``'s arbitrary dotted imports.
"""

from .metrics import MetricLogger, ProfilerHook, SmoothedValue, device_memory_stats
from .visualize import (
    STANDARD_COLORS,
    draw_bounding_box_on_image,
    visualize_boxes_and_labels_on_image_array,
)


def load_obj(obj_path: str, default_obj_path: str = "") -> object:
    """Dotted-path object import (reference load_obj,
    utils/detection_utils.py:12-29).

    Kept for API parity; the framework's own config resolution goes through
    explicit registries (engine.optim, data.transforms) instead of arbitrary
    imports, and torch/albumentations dotted names are transparently remapped
    to their registry equivalents so reference YAML configs keep working.
    """
    from ..data.transforms import TRANSFORM_REGISTRY
    from ..engine.optim import OPTIMIZER_REGISTRY, SCHEDULER_REGISTRY

    for registry in (TRANSFORM_REGISTRY, OPTIMIZER_REGISTRY, SCHEDULER_REGISTRY):
        if obj_path in registry:
            return registry[obj_path]

    import importlib

    obj_path_list = obj_path.rsplit(".", 1)
    module_path = obj_path_list.pop(0) if len(obj_path_list) > 1 else default_obj_path
    obj_name = obj_path_list[0]
    module = importlib.import_module(module_path)
    if not hasattr(module, obj_name):
        raise AttributeError(f"Object `{obj_name}` cannot be loaded from `{module_path}`.")
    return getattr(module, obj_name)


def collate_fn(batch):
    """Ragged tuple collate (reference collate_fn, utils/detection_utils.py:7-9).

    Kept for API parity with user code that builds its own loaders; the
    framework's device path uses :class:`..data.DetectionLoader`'s fixed-shape
    batches instead.
    """
    return tuple(zip(*batch))


def enable_compilation_cache(path: str = "/tmp/jax_comp_cache") -> None:
    """Persist XLA executables across processes.

    First compiles of the full model take minutes (especially via remote
    compile paths); the cache turns repeat runs into cache hits. Called by
    bench.py, the examples and the test conftest.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def seed_everything(seed: int) -> int:
    """Deterministic seeding across python/numpy (pl.seed_everything parity,
    used by the reference demo notebook). JAX randomness is key-based, so the
    seed flows into PRNGKeys explicitly."""
    import os
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed % (2**32))
    from ..data import transforms as _tfms

    _tfms.reseed(seed)  # fallback generator for rng-less transform calls
    os.environ["PL_GLOBAL_SEED"] = str(seed)
    return seed


__all__ = [
    "MetricLogger",
    "ProfilerHook",
    "STANDARD_COLORS",
    "SmoothedValue",
    "collate_fn",
    "device_memory_stats",
    "draw_bounding_box_on_image",
    "enable_compilation_cache",
    "load_obj",
    "seed_everything",
    "visualize_boxes_and_labels_on_image_array",
]
