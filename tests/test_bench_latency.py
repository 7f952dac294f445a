"""Smoke test for the serving-latency benchmark script.

``scripts/bench_latency.py`` times the per-frame serving step (the same
``deploy._build_step`` program mmmot-export serializes — SURVEY.md §3.2
online predict).  This runs it end-to-end on the CPU backend at the
debug scale and asserts the JSON contract; the int8 row is skipped (the
int8 trunk is a TPU design point — XLA:CPU lowers it pathologically
slowly, measured minutes/frame at debug scale).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_latency_cpu_smoke(tmp_path):
    out = tmp_path / "latency.json"
    env = dict(os.environ)
    prof = tmp_path / "prof"
    env.update({
        "MMMOT_LAT_CPU": "1",
        "MMMOT_LAT_STEPS": "3",
        "MMMOT_LAT_INT8": "0",
        "MMMOT_LAT_OUT": str(out),
        "MMMOT_LAT_PROFILE": str(prof),
        "MMMOT_XLA_CACHE": str(tmp_path / "cache"),
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_latency.py")],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {lines!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "serve_step_latency"
    row = rec["bf16"]
    assert row["sync_ms_p50"] > 0
    assert row["sync_ms_p99"] >= row["sync_ms_p50"]
    # Pipelined dispatch can't be slower than per-step sync by more than
    # timing noise (it removes the host round-trip per frame).
    assert row["pipelined_ms"] <= row["sync_ms_mean"] * 1.5
    assert "int8" not in rec
    # The artifact landed where MMMOT_LAT_OUT pointed, not results/.
    assert out.exists()
    saved = json.loads(out.read_text())
    assert saved["bf16"]["sync_ms_p50"] == row["sync_ms_p50"]
    # MMMOT_LAT_PROFILE captured an xplane trace of the scan probe (the
    # serving-step speed-of-light accounting in docs/PERFORMANCE.md).
    import glob
    assert glob.glob(str(prof / "bf16" / "**" / "*.xplane.pb"),
                     recursive=True), "no xplane trace captured"
