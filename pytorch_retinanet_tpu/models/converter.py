"""torch → JAX weight conversion for ImageNet ResNet backbones.

The reference downloads torchvision ImageNet checkpoints at model construction
(``retinanet/backbone.py:269-274`` via ``load_state_dict_from_url``). The TPU
framework keeps that capability as an explicit, offline converter: given a
torchvision ResNet ``state_dict`` file (``.pth``), rewrite it into this
package's flax variable pytree (params + batch stats).

Layout notes:
  * torch conv weights are OIHW; flax expects HWIO → transpose (2, 3, 1, 0).
  * torch BN ``weight/bias/running_mean/running_var`` map to flax
    ``scale/bias`` (params) and ``mean/var`` (batch_stats).
  * The classifier head (``fc.*``) is dropped — the backbone is a feature
    extractor (reference backbone.py:246-263 never runs fc/avgpool).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .backbone import RESNET_SPECS


def _to_numpy(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def torch_resnet_to_flax(
    state_dict: Mapping[str, Any], kind: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torchvision ResNet state_dict → (params, batch_stats) subtrees
    shaped for :class:`..models.backbone.ResNetBackbone`."""
    block_kind, depths = RESNET_SPECS[kind]
    n_convs = 2 if block_kind == "basic" else 3
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_conv(flax_name: str, torch_key: str) -> None:
        params[flax_name] = {"kernel": sd[torch_key].transpose(2, 3, 1, 0)}

    def put_bn(flax_name: str, torch_prefix: str) -> None:
        params[flax_name] = {
            "BatchNorm_0": {
                "scale": sd[f"{torch_prefix}.weight"],
                "bias": sd[f"{torch_prefix}.bias"],
            }
        }
        stats[flax_name] = {
            "BatchNorm_0": {
                "mean": sd[f"{torch_prefix}.running_mean"],
                "var": sd[f"{torch_prefix}.running_var"],
            }
        }

    put_conv("stem_conv", "conv1.weight")
    put_bn("stem_bn", "bn1")

    for stage, depth in enumerate(depths, start=1):
        for i in range(depth):
            blk = f"layer{stage}_block{i}"
            tprefix = f"layer{stage}.{i}"
            block_params: Dict[str, Any] = {}
            block_stats: Dict[str, Any] = {}
            for j in range(1, n_convs + 1):
                block_params[f"conv{j}"] = {
                    "kernel": sd[f"{tprefix}.conv{j}.weight"].transpose(2, 3, 1, 0)
                }
                block_params[f"bn{j}"] = {
                    "BatchNorm_0": {
                        "scale": sd[f"{tprefix}.bn{j}.weight"],
                        "bias": sd[f"{tprefix}.bn{j}.bias"],
                    }
                }
                block_stats[f"bn{j}"] = {
                    "BatchNorm_0": {
                        "mean": sd[f"{tprefix}.bn{j}.running_mean"],
                        "var": sd[f"{tprefix}.bn{j}.running_var"],
                    }
                }
            if f"{tprefix}.downsample.0.weight" in sd:
                block_params["downsample_conv"] = {
                    "kernel": sd[f"{tprefix}.downsample.0.weight"].transpose(2, 3, 1, 0)
                }
                block_params["downsample_bn"] = {
                    "BatchNorm_0": {
                        "scale": sd[f"{tprefix}.downsample.1.weight"],
                        "bias": sd[f"{tprefix}.downsample.1.bias"],
                    }
                }
                block_stats["downsample_bn"] = {
                    "BatchNorm_0": {
                        "mean": sd[f"{tprefix}.downsample.1.running_mean"],
                        "var": sd[f"{tprefix}.downsample.1.running_var"],
                    }
                }
            params[blk] = block_params
            stats[blk] = block_stats
    return params, stats


def load_torch_resnet(variables: Mapping, path: str, kind: str) -> Dict[str, Any]:
    """Return a copy of `variables` with the backbone subtree replaced by the
    converted torch checkpoint at `path` (a torchvision ResNet ``.pth``)."""
    import jax
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state_dict, dict) and "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    new_params, new_stats = torch_resnet_to_flax(state_dict, kind)

    # Space-to-depth stem target: rewrite the 7x7 stem kernel into the exactly
    # equivalent 4x4x(4*Cin) form (see layers.stem_kernel_to_s2d).
    target_stem = (
        variables.get("params", {}).get("backbone", {}).get("stem_conv", {}).get("kernel")
    )
    if target_stem is not None and tuple(target_stem.shape[:2]) == (4, 4):
        from .layers import stem_kernel_to_s2d

        new_params["stem_conv"]["kernel"] = stem_kernel_to_s2d(
            new_params["stem_conv"]["kernel"]
        )

    variables = jax.tree_util.tree_map(lambda x: x, dict(variables))  # shallow copy
    out = {k: dict(v) for k, v in variables.items()}

    def merge(dst: Dict[str, Any], src: Dict[str, Any]) -> Dict[str, Any]:
        """Overwrite dst leaves with src values, preserving dtypes/shape checks."""
        for k, v in src.items():
            if isinstance(v, dict):
                dst[k] = merge(dict(dst.get(k, {})), v)
            else:
                old = dst.get(k)
                if old is not None and tuple(old.shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch for {k}: checkpoint {v.shape} vs model {old.shape}"
                    )
                dst[k] = np.asarray(v, dtype=np.float32)
        return dst

    out["params"] = dict(out["params"])
    out["params"]["backbone"] = merge(
        {k: v for k, v in out["params"].get("backbone", {}).items()}, new_params
    )
    if "batch_stats" in out:
        out["batch_stats"] = dict(out["batch_stats"])
        out["batch_stats"]["backbone"] = merge(
            {k: v for k, v in out["batch_stats"].get("backbone", {}).items()}, new_stats
        )
    return out
