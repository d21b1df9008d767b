"""A/B one XLA:TPU flag set on the production train step (bs16 R50-FPN).

ROOFLINE_TRAIN.md shows the step backward-bound at 46.8% MFU with the
backward never directly tuned — the one compiler-level lever left
unexplored is XLA's scheduling/fusion flags. This script measures the
EXACT bench_train step (same build_step/measure) under whatever XLA_FLAGS
the caller exports, so flag sets can be A/B'd serially:

    XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
        python tools/experiments/xla_flags_train.py --batch 16

Each distinct flag set changes the compile-cache key, so every run pays a
fresh remote compile (minutes; use the two-attempt 595 s protocol from
CLAUDE.md). Results are appended to tools/experiments/XLA_FLAGS_TRAIN.jsonl
— one JSON line per run — and the winner (if any) gets promoted into the
production env docs.

Flags must be exported BEFORE the first jax import (XLA parses the env var
at backend init), which is why this is env-driven rather than --flags.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_train import measure  # noqa: E402  (tools/bench_train.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    import jax

    print(f"device: {jax.devices()[0]}  XLA_FLAGS={flags!r}", flush=True)
    img_s, ms = measure(
        "resnet50", (800, 1344), args.batch, False, False, args.iters
    )
    rec = {
        "xla_flags": flags,
        "batch": args.batch,
        "img_per_sec": round(img_s, 2),
        "step_ms": round(ms, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))
    out = os.path.join(os.path.dirname(__file__), "XLA_FLAGS_TRAIN.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
