"""Opt-in REAL multi-process distributed test (VERDICT r2 #4).

Executes every `jax.process_count() > 1` branch for real: 2 OS processes x 2
virtual CPU devices, joined via `jax.distributed.initialize`, running sharded
`Trainer.test` + 2 SPMD train steps, asserting the merged AP and detection
records equal a single-process run (tools/multihost_smoke.py).

Opt-in because each jax process pays this container's 1-2 min serial tunnel
handshake (3 processes ≈ 5-8 min wall):

    RUN_MULTIHOST=1 python -m pytest tests/test_multihost.py -q
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.skipif(
    not os.environ.get("RUN_MULTIHOST"),
    reason="slow 3-process run; set RUN_MULTIHOST=1 to enable",
)
def test_two_process_distributed_smoke(tmp_path):
    out = str(tmp_path / "MULTIHOST.json")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # orchestrator/workers set their own
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py"),
         "--workdir", str(tmp_path / "work"), "--out", out],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    with open(out) as f:
        artifact = json.load(f)
    assert artifact["ok"], artifact["checks"]
    assert artifact["checks"]["process_count_2"]
    assert artifact["checks"]["ap_matches_single_process"]
    assert artifact["checks"]["records_match_single_process"]
