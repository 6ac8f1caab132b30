"""Tiny-mode smokes for the BASELINE-config drive scripts.

Env-gated (LTX_SCRIPT_SMOKE=1): each runs a subprocess in --tiny --cpu mode
(~1-2 min apiece), asserting the script completes and prints its JSON line.
These are the scripts the on-chip measurements run; keeping their plumbing
green keeps the bench queue runnable.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

if not os.environ.get("LTX_SCRIPT_SMOKE"):
    pytest.skip("set LTX_SCRIPT_SMOKE=1 to run drive-script smokes", allow_module_level=True)

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.parametrize(
    "script,expect_metric",
    [
        ("scripts/e2e_timing.py", "e2e_tiny_seconds"),
        ("scripts/e2e_config3.py", "e2e_config3_dev_cfg_seconds"),
        ("scripts/e2e_config4.py", "e2e_config4_keyframe_guide_seconds"),
        ("scripts/e2e_config5.py", "config5_lora_v2v_train_step"),
        ("scripts/aot_scaling.py", "aot_scaling_table"),
        ("scripts/serve_load.py", "serve_load_p50_latency"),
        # dial_sweep prints per-setting rows keyed by "setting", not "metric"
        ("scripts/dial_sweep.py", "off"),
    ],
)
def test_script_tiny_smoke(script, expect_metric):
    out = subprocess.run(
        [sys.executable, str(ROOT / script), "--tiny", "--cpu"],
        capture_output=True, text=True, timeout=900, cwd=str(ROOT),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = [
        json.loads(line)
        for line in out.stdout.splitlines()
        if line.startswith("{")
    ]
    assert any(
        expect_metric in (m.get("metric"), m.get("setting")) for m in metrics
    ), out.stdout[-2000:]


def test_bench_tiny_smoke():
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--tiny", "--cpu", "--dev"],
        capture_output=True, text=True, timeout=900, cwd=str(ROOT),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= payload.keys()


def test_multihost_drive():
    """REAL 2-process jax.distributed training: one SIGTERM, cross-process
    agreed checkpoint, exact resume (scripts/drive_multihost.py)."""
    out = subprocess.run(
        [sys.executable, str(ROOT / "scripts/drive_multihost.py")],
        capture_output=True, text=True, timeout=1500, cwd=str(ROOT),
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-1000:])
    assert "DRIVE_PASS" in out.stdout
