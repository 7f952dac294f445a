"""Smoke test for the driver-contract benchmark script.

``bench.py`` is the one script the round driver runs unattended on real TPU
hardware; a regression there records NO performance number for the whole
round (round 2's rc=124).  This exercises the full script end-to-end on the
CPU backend at tiny shapes and asserts the one-JSON-line contract.

Covers the round-3 hardening specifically: params-as-arguments lowering,
the bounded verification fetch, the warm run, and the deadline/watchdog
paths NOT firing on a healthy run.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_cpu_smoke(tmp_path):
    env = dict(os.environ)
    env.update({
        "MMMOT_BENCH_CPU": "1",
        "MMMOT_BENCH_S": "1",
        "MMMOT_BENCH_T": "6",
        "MMMOT_BENCH_N": "8",
        "MMMOT_BENCH_P": "32",
        "MMMOT_BENCH_CROP": "32",
        "MMMOT_BENCH_CHUNK": "8",
        "MMMOT_BENCH_RUNS": "2",
        "MMMOT_BENCH_DEADLINE": "560",
        # keep the repo cache read-only from tests
        "MMMOT_XLA_CACHE": str(tmp_path / "cache"),
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {lines!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "kitti_tracking_fps_per_chip"
    assert rec["unit"] == "frames/sec"
    assert rec["value"] > 0
    assert rec["config"]["dropped_dets"] == 0
    assert rec["config"]["devices"] == 1
    assert len(rec["config"]["run_secs"]) >= 1
    # Heartbeats are stderr-only and cover every stage on a healthy run.
    for stage in ("jax_imported", "model_init", "workload", "lowered",
                  "compiled", "warm", "verified", "run"):
        assert stage in rec["config"]["stage_secs"], stage
        assert f"] {stage}" in proc.stderr, stage


def test_bench_quality_stack_smoke(tmp_path):
    """The quality-winning configuration (y_det + revival + gate) must be
    benchable: MMMOT_BENCH_{DET,REVIVAL,GATE} ride the ghost-pool hybrid
    pre-solve through the same one-JSON-line contract."""
    env = dict(os.environ)
    env.update({
        "MMMOT_BENCH_CPU": "1",
        "MMMOT_BENCH_S": "1",
        "MMMOT_BENCH_T": "6",
        "MMMOT_BENCH_N": "8",
        "MMMOT_BENCH_P": "32",
        "MMMOT_BENCH_CROP": "32",
        "MMMOT_BENCH_CHUNK": "8",
        "MMMOT_BENCH_RUNS": "1",
        "MMMOT_BENCH_DEADLINE": "560",
        "MMMOT_BENCH_DET": "1",
        "MMMOT_BENCH_REVIVAL": "2",
        "MMMOT_BENCH_GATE": "1",
        "MMMOT_XLA_CACHE": str(tmp_path / "cache"),
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {lines!r}"
    rec = json.loads(lines[0])
    assert rec["value"] > 0
    assert rec["config"]["det_mode"] is True
    assert rec["config"]["revival_window"] == 2
    assert rec["config"]["iou_gate"] is True
    assert rec["config"]["dropped_dets"] == 0
