"""Max-pool backward A/B: SelectAndScatter vs compare-routed custom VJPs.

Round-5 backward decomposition (BACKWARD_PROFILE.jsonl) charged the layer1
bucket 42.5 ms — 24% of the whole backward — at 10.9% MFU / 369 GB/s, below
both rooflines. That bucket contains the stem max-pool's backward: jax
differentiates ``reduce_window(max)`` through XLA **SelectAndScatter**, a
windowed serial scatter with no good TPU tiling. This measures it in
isolation at the production shape ([B, 400, 672, 64] bf16, 3x3 s2 p1 —
the stem output at 800x1344) against two dense reformulations that replace
the scatter with shifted compares (all-elementwise, fusible):

  ss     production: jax.grad of nn.max_pool           (SelectAndScatter)
  cmp    tie-SPLIT routing: dX[i] = sum_w dY[w] * (x[i] == y[w])
         — every input equal to its window max receives the cotangent.
         Differs from torch/SelectAndScatter when a window has tied maxima
         (common: post-relu zeros), so it is measured but NOT shipped.
  key64  EXACT first-match routing: pool once over int64 keys
         (value-bits << 19 | (2^19-1 - row-major index)); the window max of
         the key encodes BOTH the max value (exact bf16 decode) and the
         index of its FIRST occurrence — backward is 9 shifted int compares.
         Requires x >= 0 (bitcast of non-negative floats is monotonic);
         the stem pool input is post-relu, so this always holds there.

Each arm is checked against the ``ss`` gradient and the mismatch fraction
reported. MEASURED RESULT (MAXPOOL_BWD.jsonl, v5e): ss backward 9.5 ms,
cmp 17.4, key64 37.4 — both dense reformulations LOSE (the 9 shifted
tap-masks re-read the input grid; int64 emulation doubles it), so
SelectAndScatter stands as best-known. key64's smallest-index tie-break
also did not reproduce XLA's tie credit on tie-heavy post-relu input
(33% of positions move) — moot at that speed, kept for the record.

Run on the TPU host: python tools/experiments/maxpool_bwd.py
Appends one JSON line to tools/experiments/MAXPOOL_BWD.jsonl.
Matches the backward of the reference's stem max-pool (backbone.py:186).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_retinanet_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def time_scalar(fn, *args, iters=20):
    g = jax.jit(fn)
    float(jax.device_get(g(*args)))  # compile + warmup (CLAUDE.md: scalar sync)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- arms --- #


def pool_ss(x):
    from pytorch_retinanet_tpu.models.layers import max_pool_torch

    return max_pool_torch(x, 3, 2)


def _routed_grad(dy, route_eq, h, w, dtype):
    """dX = sum over taps of shifted(dy) * shifted(route_eq-test).

    ``route_eq(tap_slice_of_keys)`` returns the boolean match mask on the
    input grid for that tap; dy/key grids are interior-dilated by the
    stride so each tap is one static slice (no gather)."""
    acc = jnp.zeros((dy.shape[0], h, w, dy.shape[-1]), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            acc = acc + route_eq(dr, dc).astype(jnp.float32) * _tap(dy, dr, dc, h, w)
    return acc.astype(dtype)


def _dilate(a, h, w, fill):
    """Output grid -> input grid: interior-dilate by the stride (2) and
    edge-pad so every 3x3 tap (dr, dc) is the static slice
    a[:, dr : dr + h, dc : dc + w]. Window o sits at dilated index 2o+1;
    tap dr covers input row i = 2o + 1 - dr (the relabeled dr' = 2 - dr of
    the true window tap — the 9-tap SUM is identical, and dy/key grids use
    the SAME labeling so routing pairs stay consistent)."""
    pad = jnp.asarray(fill, a.dtype)
    cfg = [
        (0, 0, 0),
        (1, h + 2 - 2 * a.shape[1], 1),
        (1, w + 2 - 2 * a.shape[2], 1),
        (0, 0, 0),
    ]
    return jax.lax.pad(a, pad, cfg)


def _tap(a_dil, dr, dc, h, w):
    return jax.lax.slice(
        a_dil, (0, dr, dc, 0), (a_dil.shape[0], dr + h, dc + w, a_dil.shape[3])
    )


@jax.custom_vjp
def pool_cmp(x):
    return pool_ss(x)


def _pool_cmp_fwd(x):
    y = pool_ss(x)
    return y, (x, y)


def _pool_cmp_bwd(res, dy):
    x, y = res
    b, h, w, c = x.shape
    y_dil = _dilate(y, h, w, -jnp.inf)
    dy_dil = _dilate(dy.astype(jnp.float32), h, w, 0.0)

    def route(dr, dc):
        return x == _tap(y_dil, dr, dc, h, w)

    return (_routed_grad(dy_dil, route, h, w, x.dtype),)


pool_cmp.defvjp(_pool_cmp_fwd, _pool_cmp_bwd)


N_BITS = 19  # row-major index of 400x672 = 268,800 positions < 2^19


def _keys_of(x):
    """int64 key: (f32-bitcast of the value) << 19 | (2^19-1 - rowmajor n).

    Monotonic in the value for x >= 0; ties resolve to the SMALLEST n —
    the first position in window iteration order, matching XLA
    SelectAndScatter (and torch) exactly."""
    b, h, w, c = x.shape
    vbits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    n = (jnp.arange(h)[:, None] * w + jnp.arange(w)[None, :]).astype(jnp.int64)
    anti_n = (2**N_BITS - 1) - n
    return (vbits.astype(jnp.int64) << N_BITS) | anti_n[None, :, :, None]


def _key_pool(k):
    return jax.lax.reduce_window(
        k, jnp.int64(-1), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


@jax.custom_vjp
def pool_key64(x):
    return pool_ss(x)


def _pool_key64_fwd(x):
    yk = _key_pool(_keys_of(x))
    y = jax.lax.bitcast_convert_type(
        (yk >> N_BITS).astype(jnp.int32), jnp.float32
    ).astype(x.dtype)
    return y, (x, yk)


def _pool_key64_bwd(res, dy):
    x, yk = res
    b, h, w, c = x.shape
    keys = _keys_of(x)
    yk_dil = _dilate(yk, h, w, -1)
    dy_dil = _dilate(dy.astype(jnp.float32), h, w, 0.0)

    def route(dr, dc):
        return keys == _tap(yk_dil, dr, dc, h, w)

    return (_routed_grad(dy_dil, route, h, w, x.dtype),)


pool_key64.defvjp(_pool_key64_fwd, _pool_key64_bwd)


# ------------------------------------------------------------------------- #


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=400)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    b, h, w, c = args.batch, args.height, args.width, args.channels

    rng = np.random.default_rng(0)
    # Post-relu stem activations: non-negative, ~half exact zeros (the tie
    # case that makes cmp differ and key64 matter).
    x = jnp.asarray(
        np.maximum(rng.standard_normal((b, h, w, c)), 0.0), jnp.bfloat16
    )

    arms = {"ss": pool_ss, "cmp": pool_cmp, "key64": pool_key64}

    # correctness first: forwards identical; grads vs the ss reference
    g_ref = None
    report = {}
    for name, fn in arms.items():
        y = jax.jit(fn)(x)
        if name == "ss":
            y_ref = y
        else:
            assert jnp.array_equal(y, y_ref), f"{name} forward != max_pool"
        grad = jax.jit(jax.grad(lambda v, f=fn: jnp.sum(f(v).astype(jnp.float32))))(x)
        if name == "ss":
            g_ref = grad
        else:
            exact = bool(jnp.array_equal(grad, g_ref))
            report[f"{name}_grad_bitwise_equal_ss"] = exact
            report[f"{name}_grad_mismatch_frac"] = float(
                jnp.mean((grad != g_ref).astype(jnp.float32))
            )

    def fwd_scalar(fn):
        return lambda v: jnp.sum(fn(v).astype(jnp.float32))

    def grad_scalar(fn):
        base = fwd_scalar(fn)

        def g(v):
            val, gr = jax.value_and_grad(base)(v)
            return val + jnp.float32(1e-30) * jnp.sum(jnp.abs(gr).astype(jnp.float32))

        return g

    times = {}
    for name, fn in arms.items():
        times[f"{name}_fwd_ms"] = round(
            time_scalar(fwd_scalar(fn), x, iters=args.iters) * 1e3, 3
        )
        times[f"{name}_grad_ms"] = round(
            time_scalar(grad_scalar(fn), x, iters=args.iters) * 1e3, 3
        )
        print(name, times[f"{name}_fwd_ms"], times[f"{name}_grad_ms"], flush=True)

    record = {
        "shape": [b, h, w, c],
        "backend": jax.default_backend(),
        **times,
        **report,
        "note": "grad_ms includes the forward (value_and_grad); the backward "
        "cost of each arm is grad_ms - fwd_ms of the SAME arm. cmp differs "
        "from ss on tied windows by design; key64 targets first-match but "
        "its smallest-index tie-break did not reproduce XLA's tie credit.",
    }
    out = os.path.join(os.path.dirname(__file__), "MAXPOOL_BWD.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
