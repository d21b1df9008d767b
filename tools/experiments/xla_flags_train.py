"""A/B XLA:TPU compiler options on the production train step (bs16 R50-FPN).

ROOFLINE_TRAIN.md shows the step backward-bound at 46.8% MFU with the
backward never directly tuned — the one compiler-level lever left
unexplored is XLA's scheduling/fusion knobs. This script measures the
EXACT bench_train step (same build_step/measure) under a named compiler
option set, passed via ``jax.jit(compiler_options=...)`` — NOT the
XLA_FLAGS env var, because on this harness TPU compilation happens in a
remote helper and only the serialized CompileOptions (which carry
env_option_overrides) are guaranteed to reach it.

    python tools/experiments/xla_flags_train.py --set baseline
    python tools/experiments/xla_flags_train.py --set vmem64m

Each distinct option set changes the compile-cache key, so every run pays
a fresh remote compile (minutes; two-attempt 595 s protocol from
CLAUDE.md). Results append to tools/experiments/XLA_FLAGS_TRAIN.jsonl.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_train import measure  # noqa: E402  (tools/bench_train.py)

# Candidate sets. Values are strings (env_option_overrides wire format).
SETS = {
    # no overrides — the production compile, for an apples-to-apples number
    # through this exact script
    "baseline": None,
    # 4x the default scoped-VMEM budget: lets XLA pick bigger fusion tiles /
    # deeper prefetch for the conv pipeline (the knob large-model TPU configs
    # tune first)
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    # measured: vmem64m OOMs the bs16 step (15.92G > 15.75G HBM); half-step
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    # latency-hiding scheduler: overlaps async ops; mostly a collectives
    # knob — measured here to close the question for the single-chip step
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", dest="opt_set", default="baseline",
                    choices=sorted(SETS))
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    opts = SETS[args.opt_set]
    import jax

    print(f"device: {jax.devices()[0]}  set={args.opt_set} opts={opts}",
          flush=True)
    img_s, ms = measure(
        "resnet50", (800, 1344), args.batch, False, False, args.iters,
        compiler_options=opts,
    )
    rec = {
        "set": args.opt_set,
        "compiler_options": opts,
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
