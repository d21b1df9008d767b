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
    state_dict: Mapping[str, Any], kind: str, consumed: "set | None" = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torchvision ResNet state_dict → (params, batch_stats) subtrees
    shaped for :class:`..models.backbone.ResNetBackbone`.

    ``consumed``, when given, collects exactly the keys this mapper READ —
    the full-detector converter uses it for its refuse-partial-load check
    (blanket-marking every backbone key would let unknown trunk weights be
    silently dropped)."""
    block_kind, depths = RESNET_SPECS[kind]
    n_convs = 2 if block_kind == "basic" else 3
    _plain = {k: _to_numpy(v) for k, v in state_dict.items()}

    class _Tracking(dict):
        def __getitem__(self, key):
            if consumed is not None:
                consumed.add(key)
            return dict.__getitem__(self, key)

    sd = _Tracking(_plain)

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


# --------------------------------------------------------------------------- #
# Full-detector conversion (reference-trained checkpoints)
# --------------------------------------------------------------------------- #
# The reference's documented save/reload flow is the FULL detector state_dict:
# ``torch.save(litModel.net.state_dict(), PATH)`` then
# ``Retinanet(**args).load_state_dict(torch.load(PATH))`` (demo.ipynb cells
# 23/25; reference retinanet/models.py:21). Key schema per reference modules:
#   backbone.backbone.*          ResNet trunk (backbone.py:139-263, wrapped by
#                                BackBone at backbone.py:340-360)
#   fpn.conv_c{3,4,5}_{1x1,3x3}, fpn.conv_c6_3x3, fpn.conv_c7_3x3
#                                (layers.py:12-64)
#   retinanet_head.classification_head.class_subnet.{0,2,4,6} + _output
#   retinanet_head.regression_head.box_subnet.{0,2,4,6} + _output
#                                (layers.py:67-260)
#   anchor_generator.*           BufferList constants — regenerated here, ignored
# Channel-layout note: the reference reshapes predictor outputs
# [N, A*K, H, W] -> view(N, A, K, H, W) -> permute to [N, H, W, A, K]
# (layers.py:189-195), i.e. channel index = a*K + k; the flax head reshapes
# NHWC [N, H, W, A*K] the same way, so predictor output channels map 1:1 and a
# plain OIHW->HWIO transpose is the whole conversion.

_FPN_KEYMAP = {
    "conv_c3_1x1": "lateral_c3",
    "conv_c4_1x1": "lateral_c4",
    "conv_c5_1x1": "lateral_c5",
    "conv_c3_3x3": "smooth_p3",
    "conv_c4_3x3": "smooth_p4",
    "conv_c5_3x3": "smooth_p5",
    "conv_c6_3x3": "p6",
    "conv_c7_3x3": "p7",
}

# Keys legitimately present in a reference checkpoint that carry no learned
# state for this model: anchor constants (regenerated from static shapes) and
# the ImageNet classifier head if the backbone ckpt was saved un-trimmed.
_IGNORABLE_PREFIXES = ("anchor_generator.", "backbone.backbone.fc.", "fc.")


def torch_retinanet_to_flax(
    state_dict: Mapping[str, Any], kind: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a FULL reference-schema detector ``state_dict`` into this
    package's (params, batch_stats) trees: ``{"backbone", "fpn", "head"}``
    params and ``{"backbone"}`` batch stats, shaped for
    :class:`..models.retinanet.RetinaNetModule`."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items() if not k.endswith("num_batches_tracked")}
    consumed = set()

    def take(key: str) -> np.ndarray:
        if key not in sd:
            raise KeyError(
                f"reference checkpoint is missing key {key!r} — not a full "
                "detector state_dict? (expected the schema of "
                "`torch.save(litModel.net.state_dict())`)"
            )
        consumed.add(key)
        return sd[key]

    def conv(prefix: str) -> Dict[str, np.ndarray]:
        return {
            "kernel": take(f"{prefix}.weight").transpose(2, 3, 1, 0),
            "bias": take(f"{prefix}.bias"),
        }

    # Backbone: strip the BackBone-wrapper prefix and reuse the ResNet mapper.
    bb_prefix = "backbone.backbone."
    bb_sd = {k[len(bb_prefix):]: v for k, v in sd.items() if k.startswith(bb_prefix)}
    if not bb_sd:
        raise KeyError(
            "no 'backbone.backbone.*' keys found — full-detector checkpoints "
            "prefix ResNet weights with the BackBone wrapper (reference "
            "backbone.py:340-360)"
        )
    bb_read: set = set()
    bb_params, bb_stats = torch_resnet_to_flax(bb_sd, kind, consumed=bb_read)
    # Only the keys the ResNet mapper actually READ count as consumed, plus
    # the classifier head the detector never carries weights for; anything
    # else under backbone.backbone.* must trip the leftover check below.
    consumed.update(
        bb_prefix + k for k in bb_read if k in bb_sd
    )
    consumed.update(
        bb_prefix + k for k in bb_sd if k.startswith("fc.")
    )

    fpn_params = {ours: conv(f"fpn.{theirs}") for theirs, ours in _FPN_KEYMAP.items()}

    head_params: Dict[str, Any] = {}
    for ours, theirs, out_name in (
        ("cls_subnet", "classification_head.class_subnet", "class_subnet_output"),
        ("box_subnet", "regression_head.box_subnet", "box_subnet_output"),
    ):
        sub: Dict[str, Any] = {}
        for i, ti in enumerate((0, 2, 4, 6)):  # Sequential conv indices (ReLUs odd)
            sub[f"conv{i}"] = conv(f"retinanet_head.{theirs}.{ti}")
        sub["predictor"] = conv(f"retinanet_head.{theirs.split('.')[0]}.{out_name}")
        head_params[ours] = sub

    leftover = [
        k
        for k in sd
        if k not in consumed and not k.startswith(_IGNORABLE_PREFIXES)
    ]
    if leftover:
        raise KeyError(
            f"unrecognized keys in reference checkpoint (first 10): "
            f"{sorted(leftover)[:10]} — schema mismatch, refusing to load "
            "partially"
        )

    params = {"backbone": bb_params, "fpn": fpn_params, "head": head_params}
    stats = {"backbone": bb_stats}
    return params, stats


def _merge_checked(dst: Dict[str, Any], src: Dict[str, Any], path: str = "") -> Dict[str, Any]:
    """Overwrite dst leaves with src values; shape-checked, f32-normalized."""
    for k, v in src.items():
        sub = f"{path}/{k}" if path else k
        if isinstance(v, dict):
            dst[k] = _merge_checked(dict(dst.get(k, {})), v, sub)
        else:
            old = dst.get(k)
            if old is not None and tuple(old.shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch for {sub}: checkpoint {v.shape} vs model {old.shape}"
                )
            dst[k] = np.asarray(v, dtype=np.float32)
    return dst


def load_torch_retinanet(
    variables: Mapping, state_dict_or_path: Any, kind: str
) -> Dict[str, Any]:
    """Return a copy of `variables` with ALL detector weights replaced by a
    reference-schema full-detector checkpoint (path to a ``.pth`` or an
    in-memory state_dict). Closes the reference's documented reload flow
    (demo cells 23/25; models.py:21 + ``load_state_dict``)."""
    if isinstance(state_dict_or_path, (str, bytes)) or hasattr(state_dict_or_path, "__fspath__"):
        import torch

        state_dict = torch.load(state_dict_or_path, map_location="cpu", weights_only=True)
        if isinstance(state_dict, dict) and "state_dict" in state_dict:
            state_dict = state_dict["state_dict"]
    else:
        state_dict = state_dict_or_path
    new_params, new_stats = torch_retinanet_to_flax(state_dict, kind)

    target_stem = (
        variables.get("params", {}).get("backbone", {}).get("stem_conv", {}).get("kernel")
    )
    if target_stem is not None and tuple(target_stem.shape[:2]) == (4, 4):
        from .layers import stem_kernel_to_s2d

        new_params["backbone"]["stem_conv"]["kernel"] = stem_kernel_to_s2d(
            new_params["backbone"]["stem_conv"]["kernel"]
        )

    out = {k: dict(v) for k, v in variables.items()}
    out["params"] = _merge_checked(dict(out.get("params", {})), new_params)
    if "batch_stats" in out:
        out["batch_stats"] = _merge_checked(dict(out["batch_stats"]), new_stats)
    return out


# --------------------------------------------------------------------------- #
# JAX → torch export (the reverse migration path)
# --------------------------------------------------------------------------- #
# A TPU-trained detector exported back into the reference's checkpoint schema,
# so `Retinanet(**args).load_state_dict(torch.load(path))` (reference
# models.py:21 + demo cell 25) accepts weights trained here. Exact inverse of
# `torch_retinanet_to_flax`: same key schema, OIHW weights, BN running stats,
# plus the `num_batches_tracked` buffers torch state_dicts carry.


def _s2d_kernel_to_7x7(k4: np.ndarray, atol: float = 1e-6) -> np.ndarray:
    """Invert :func:`..models.layers.stem_kernel_to_s2d`.

    The [4,4,4*Cin,Cout] space-to-depth stem kernel covers an 8x8 receptive
    field; taps in the extra top row/column (input pixel x[2i-4]) have no 7x7
    equivalent. They are zero right after conversion but RECEIVE GRADIENTS
    when the s2d stem trains, so a trained kernel may not be representable —
    refuse with a clear error instead of silently dropping learned taps."""
    k4 = np.asarray(k4)
    kh, kw, cin4, cout = k4.shape
    assert (kh, kw) == (4, 4) and cin4 % 4 == 0, k4.shape
    cin = cin4 // 4
    k8 = (
        k4.reshape(4, 4, 2, 2, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(8, 8, cin, cout)
    )
    extra = max(np.abs(k8[0, :]).max(), np.abs(k8[:, 0]).max())
    if extra > atol:
        raise ValueError(
            "s2d stem kernel has learned taps outside the 7x7 receptive field "
            f"(max |tap| = {extra:.3g} > atol {atol:.3g}); this kernel is not "
            "representable in the reference's 7x7 stem schema. Retrain with "
            "stem_s2d=False or zero the out-of-field taps explicitly."
        )
    return k8[1:, 1:]


def flax_resnet_to_torch(
    params: Mapping[str, Any], stats: Mapping[str, Any], kind: str
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_resnet_to_flax`: flax backbone subtrees →
    torchvision ResNet state_dict (numpy values, OIHW conv layout)."""
    block_kind, depths = RESNET_SPECS[kind]
    n_convs = 2 if block_kind == "basic" else 3
    out: Dict[str, np.ndarray] = {}

    def put_conv(torch_key: str, p: Mapping[str, Any]) -> None:
        out[torch_key] = np.asarray(p["kernel"], np.float32).transpose(3, 2, 0, 1)

    def put_bn(torch_prefix: str, p: Mapping[str, Any], s: Mapping[str, Any]) -> None:
        bnp, bns = p["BatchNorm_0"], s["BatchNorm_0"]
        out[f"{torch_prefix}.weight"] = np.asarray(bnp["scale"], np.float32)
        out[f"{torch_prefix}.bias"] = np.asarray(bnp["bias"], np.float32)
        out[f"{torch_prefix}.running_mean"] = np.asarray(bns["mean"], np.float32)
        out[f"{torch_prefix}.running_var"] = np.asarray(bns["var"], np.float32)
        out[f"{torch_prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    stem = np.asarray(params["stem_conv"]["kernel"], np.float32)
    if tuple(stem.shape[:2]) == (4, 4):
        stem = _s2d_kernel_to_7x7(stem)
    out["conv1.weight"] = stem.transpose(3, 2, 0, 1)
    put_bn("bn1", params["stem_bn"], stats["stem_bn"])

    for stage, depth in enumerate(depths, start=1):
        for i in range(depth):
            blk_p = params[f"layer{stage}_block{i}"]
            blk_s = stats[f"layer{stage}_block{i}"]
            tprefix = f"layer{stage}.{i}"
            for j in range(1, n_convs + 1):
                put_conv(f"{tprefix}.conv{j}.weight", blk_p[f"conv{j}"])
                put_bn(f"{tprefix}.bn{j}", blk_p[f"bn{j}"], blk_s[f"bn{j}"])
            if "downsample_conv" in blk_p:
                put_conv(f"{tprefix}.downsample.0.weight", blk_p["downsample_conv"])
                put_bn(
                    f"{tprefix}.downsample.1",
                    blk_p["downsample_bn"],
                    blk_s["downsample_bn"],
                )
    return out


def flax_retinanet_to_torch(
    variables: Mapping, kind: str
) -> Dict[str, np.ndarray]:
    """Export this package's full-detector variables into the reference's
    ``state_dict`` schema (``backbone.backbone.* / fpn.* / retinanet_head.*``,
    numpy values). The exact inverse of :func:`torch_retinanet_to_flax` — a
    reference ``Retinanet`` loads the result with ``strict=True`` (reference
    models.py:21; key schema per layers.py:12-260, backbone.py:340-360)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    for k, v in flax_resnet_to_torch(
        params["backbone"], stats["backbone"], kind
    ).items():
        sd[f"backbone.backbone.{k}"] = v

    def conv(prefix: str, p: Mapping[str, Any]) -> None:
        sd[f"{prefix}.weight"] = np.asarray(p["kernel"], np.float32).transpose(
            3, 2, 0, 1
        )
        sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)

    for theirs, ours in _FPN_KEYMAP.items():
        conv(f"fpn.{theirs}", params["fpn"][ours])

    for ours, theirs, out_name in (
        ("cls_subnet", "classification_head.class_subnet", "class_subnet_output"),
        ("box_subnet", "regression_head.box_subnet", "box_subnet_output"),
    ):
        sub = params["head"][ours]
        for i, ti in enumerate((0, 2, 4, 6)):
            conv(f"retinanet_head.{theirs}.{ti}", sub[f"conv{i}"])
        conv(f"retinanet_head.{theirs.split('.')[0]}.{out_name}", sub["predictor"])
    return sd


def save_torch_retinanet(variables: Mapping, path: str, kind: str) -> None:
    """``torch.save`` the exported reference-schema state_dict at ``path`` —
    the file the reference's documented reload flow consumes."""
    import torch

    # copy=True: transposed views are non-contiguous and jax exports are
    # read-only — torch.from_numpy needs a writable contiguous buffer.
    sd = {k: torch.from_numpy(np.array(v, copy=True)) for k, v in
          flax_retinanet_to_torch(variables, kind).items()}
    torch.save(sd, path)


def load_torch_resnet(variables: Mapping, path: str, kind: str) -> Dict[str, Any]:
    """Return a copy of `variables` with the backbone subtree replaced by the
    converted torch checkpoint at `path` (a torchvision ResNet ``.pth``)."""
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

    out = {k: dict(v) for k, v in variables.items()}
    out["params"]["backbone"] = _merge_checked(
        {k: v for k, v in out["params"].get("backbone", {}).items()}, new_params
    )
    if "batch_stats" in out:
        out["batch_stats"]["backbone"] = _merge_checked(
            {k: v for k, v in out["batch_stats"].get("backbone", {}).items()}, new_stats
        )
    return out
