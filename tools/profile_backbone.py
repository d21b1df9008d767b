"""Per-stage backbone profile: stem / layer1..4 nested cuts on the real chip.

The inference roofline (docs/ROOFLINE.md) shows the R50 trunk at ~35% MFU —
this tool locates WHERE: each cut jits the trunk up to a given stage, so the
deltas isolate stem+maxpool, layer1, layer2, layer3, layer4. Per-stage
analytic FLOPs and activation bytes give each stage its own roofline verdict
(compute-bound vs HBM-bound).

Run on the TPU host: ``python tools/profile_backbone.py [--batch 16] [--s2d]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_retinanet_tpu.utils import enable_compilation_cache

enable_compilation_cache()

PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))
PEAK_GBPS = float(os.environ.get("PEAK_GBPS", "819"))  # v5e HBM bandwidth


def time_fn(fn, *args, iters=20):
    @jax.jit
    def g(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    float(jax.device_get(g(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters


def conv_flops(out_hw, k, cin, cout):
    return 2 * out_hw[0] * out_hw[1] * k * k * cin * cout


def stage_flops_bytes(h, w, batch):
    """Per-stage (GFLOP, GB of activation traffic, conservative) for R50."""
    bf2 = 2  # bf16 bytes
    stats = {}
    # stem: conv7x7s2 (3->64) + BN/relu + maxpool
    oh, ow = h // 2, w // 2
    fl = conv_flops((oh, ow), 7, 3, 64)
    by = (h * w * 3 * 4) + (oh * ow * 64 * bf2) * 2 + (h // 4) * (w // 4) * 64 * bf2
    stats["stem"] = (fl, by)
    cfg = [
        ("layer1", 3, 64, 64, 1),
        ("layer2", 4, 128, 256, 2),
        ("layer3", 6, 256, 512, 2),
        ("layer4", 3, 512, 1024, 2),
    ]
    sh, sw = h // 4, w // 4
    for name, blocks, width, cin, stride in cfg:
        oh, ow = sh // stride, sw // stride
        fl = by = 0
        for b in range(blocks):
            icin = cin if b == 0 else width * 4
            ih, iw = (sh, sw) if b == 0 else (oh, ow)
            s = stride if b == 0 else 1
            fl += conv_flops((ih, iw), 1, icin, width)
            fl += conv_flops((oh, ow), 3, width, width)
            fl += conv_flops((oh, ow), 1, width, width * 4)
            if b == 0:
                fl += conv_flops((oh, ow), 1, icin, width * 4)
            # traffic: read block input, write/read the two thin tensors,
            # write wide output, read residual for the add
            by += (ih * iw * icin + 4 * oh * ow * width + 3 * oh * ow * width * 4) * bf2
        stats[name] = (fl, by)
        sh, sw = oh, ow
    return {k: (f * batch, b * batch) for k, (f, b) in stats.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--s2d", action="store_true", help="space-to-depth stem")
    args = ap.parse_args()

    from pytorch_retinanet_tpu.models.backbone import ResNetBackbone

    h, w = 800, 1344
    B = args.batch
    backbone = ResNetBackbone(kind="resnet50", stem_s2d=args.s2d)
    x0 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = backbone.init(jax.random.PRNGKey(0), x0)
    x = jnp.asarray(np.random.default_rng(0).random((B, h, w, 3), np.float32))

    # Nested cuts through the public apply via capture_intermediates: we only
    # return the captured intermediate, so XLA dead-code-eliminates everything
    # downstream of it and each cut really stops at its stage.
    names = ["stem", "layer1", "layer2", "layer3", "layer4"]
    filters = {
        "stem": lambda mdl, _m: mdl.name == "stem_bn",
        "layer1": lambda mdl, _m: mdl.name == "layer1_block2",
        "layer2": lambda mdl, _m: mdl.name == "layer2_block3",
        "layer3": lambda mdl, _m: mdl.name == "layer3_block5",
        "layer4": lambda mdl, _m: mdl.name == "layer4_block2",
    }

    # capture_intermediates still executes the whole trunk; XLA dead-code
    # eliminates everything past the captured output because we only return
    # the intermediate.
    def cut(name):
        def f(v, im):
            _, st = backbone.apply(
                v, im, capture_intermediates=filters[name], mutable=["intermediates"]
            )
            inter = st["intermediates"]
            leaves = jax.tree_util.tree_leaves(inter)
            return leaves

        return f

    stats = stage_flops_bytes(h, w, B)
    times = {}
    for name in names:
        times[name] = time_fn(cut(name), variables, x, iters=args.iters)

    print(f"batch={B} s2d={args.s2d} backend={jax.default_backend()}")
    print("| stage | ms (delta) | GFLOP | GB | TFLOP/s | GB/s | bound |")
    print("|---|---|---|---|---|---|---|")
    prev = 0.0
    for name in names:
        dt = times[name] - prev
        prev = times[name]
        fl, by = stats[name]
        tf = fl / dt / 1e12 if dt > 0 else 0
        gbps = by / dt / 1e9 if dt > 0 else 0
        t_c = fl / (PEAK_TFLOPS * 1e12)
        t_m = by / (PEAK_GBPS * 1e9)
        bound = "compute" if t_c > t_m else "HBM"
        print(
            f"| {name} | {dt*1e3:.1f} | {fl/1e9:.0f} | {by/1e9:.2f} | "
            f"{tf:.1f} | {gbps:.0f} | {bound} |"
        )
    print(json.dumps({k: round(v * 1e3, 2) for k, v in times.items()}))


if __name__ == "__main__":
    main()
