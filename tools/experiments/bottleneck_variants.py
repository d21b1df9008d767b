"""A/B: fused-bottleneck kernel variants vs the XLA composition, standalone.

Round-3 measured the fused bottleneck SLOWER end-to-end (194.3 vs 215.4
img/s; docs/ROOFLINE_BACKBONE.md) and named two follow-ups: amortize
per-cell overhead with bigger row tiles, and deepen the conv2 GEMMs. This
script measures both levers per variant, single block, at the layer1 and
layer2 production shapes (bs32, 800x1344 bucket):

  v0            round-3 kernel: 9 tap GEMMs (K=mid), full-C f32 conv3 acc
  dyconcat      conv2 as 3 GEMMs with K=3*mid (dy slices concat on channels)
  chunk         conv3/residual/store in 128-wide C chunks -> smaller live
                accumulator -> bigger row tile R (VMEM budget 12.5 MB)
  dyconcat+chunk
  (each also reports the chosen row tile R)

Timing per the CLAUDE.md axon rule: scalar reduction inside the jit,
float(jax.device_get(...)). Correctness: max |err| vs bottleneck_reference_xla
on the first iteration of every variant.

Usage: python tools/experiments/bottleneck_variants.py [--iters 20]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pytorch_retinanet_tpu.kernels.bottleneck_pallas import (  # noqa: E402
    _fused_bottleneck_impl,
    bottleneck_reference_xla,
)

SHAPES = {
    # name: (B, H, W, C, mid)
    "layer1 (200x336, C256, mid64)": (32, 200, 336, 256, 64),
    "layer2 (100x168, C512, mid128)": (32, 100, 168, 512, 128),
}

VARIANTS = {
    "v0 (r3 kernel)": dict(),
    "dyconcat": dict(dy_concat=True),
    "chunk128": dict(cout_chunk=128, vmem_budget=int(12.5 * 2**20), max_rows=32),
    "dyconcat+chunk128": dict(
        dy_concat=True, cout_chunk=128, vmem_budget=int(12.5 * 2**20), max_rows=32
    ),
}


def bench(fn, args, iters):
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(jax.device_get(g(*args)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    print("device:", jax.devices()[0])

    rng = np.random.default_rng(0)
    for name, (b, h, w, c, mid) in SHAPES.items():
        x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32) * 0.5)
        w1 = jnp.asarray(rng.standard_normal((c, mid)).astype(np.float32) * 0.05)
        w2 = jnp.asarray(
            rng.standard_normal((3, 3, mid, mid)).astype(np.float32) * 0.05
        )
        w3 = jnp.asarray(rng.standard_normal((mid, c)).astype(np.float32) * 0.05)
        ones_m = jnp.ones((mid,), jnp.float32)
        zeros_m = jnp.zeros((mid,), jnp.float32)
        ones_c = jnp.ones((c,), jnp.float32)
        zeros_c = jnp.zeros((c,), jnp.float32)
        block_args = (
            x, w1, ones_m, zeros_m, w2, ones_m, zeros_m, w3, ones_c, zeros_c,
        )

        ref_ms = bench(bottleneck_reference_xla, block_args, args.iters)
        ref_out = np.asarray(
            jax.jit(bottleneck_reference_xla)(*block_args), np.float32
        )
        print(f"\n== {name} ==")
        print(f"  XLA composition: {ref_ms:8.3f} ms")

        for vname, opts in VARIANTS.items():
            from pytorch_retinanet_tpu.kernels.bottleneck_pallas import _pick_rows

            w8 = -(-w // 8) * 8
            r = _pick_rows(
                h, w8, c, mid, opts.get("cout_chunk", 0),
                opts.get("vmem_budget", 10 * 2**20), opts.get("max_rows", 16),
            )
            fn = functools.partial(_fused_bottleneck_impl, interpret=False, **opts)
            try:
                out = np.asarray(jax.jit(fn)(*block_args), np.float32)
                err = float(np.abs(out - ref_out).max())
                ms = bench(fn, block_args, args.iters)
            except Exception as e:
                print(f"  {vname:24s} R={r:3d}  FAILED: {str(e)[:140]}")
                continue
            print(
                f"  {vname:24s} R={r:3d}  {ms:8.3f} ms   max|err|={err:.4f}  "
                f"({'WIN' if ms < ref_ms else 'lose'} vs XLA {ref_ms:.2f})"
            )


if __name__ == "__main__":
    main()
