"""Pretrained backbone weights: torchvision model-zoo URLs + cached fetch.

The reference downloads ImageNet ResNet weights at model construction via
``load_state_dict_from_url`` (reference backbone.py:10-16 URL table, :269-274
download). This module keeps the same URL table and provides an explicit,
cache-aware fetch + convert step. In air-gapped environments, point
``pretrained_path`` (or the ``RETINANET_TPU_WEIGHTS_DIR`` env var) at
pre-downloaded ``.pth`` files instead.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

# Reference backbone.py:10-16 (torchvision model zoo).
MODEL_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth",
    "resnet152": "https://download.pytorch.org/models/resnet152-b121ed2d.pth",
}


def cache_dir() -> str:
    return os.environ.get(
        "RETINANET_TPU_WEIGHTS_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "pytorch_retinanet_tpu"),
    )


def cached_weight_path(kind: str) -> str:
    return os.path.join(cache_dir(), os.path.basename(MODEL_URLS[kind]))


def fetch_backbone_weights(kind: str, path: Optional[str] = None) -> Optional[str]:
    """Resolve a local ``.pth`` for `kind`: explicit path → cache → download.

    Returns None (with a warning) when offline and uncached — model falls back
    to random init, mirroring the reference's behavior when the download fails.
    """
    if path and os.path.exists(path):
        return path
    cached = cached_weight_path(kind)
    if os.path.exists(cached):
        return cached
    url = MODEL_URLS[kind]
    try:
        import urllib.request

        os.makedirs(cache_dir(), exist_ok=True)
        logger.info("downloading %s -> %s", url, cached)
        urllib.request.urlretrieve(url, cached + ".tmp")
        os.replace(cached + ".tmp", cached)
        return cached
    except Exception as e:  # zero-egress environments land here
        logger.warning(
            "could not fetch pretrained %s weights (%s); using random init. "
            "Place the torchvision checkpoint at %s for offline use.",
            kind, e, cached,
        )
        return None
