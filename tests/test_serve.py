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


@pytest.mark.parametrize("compact", [None, "3"])
def test_serve_multistream_interleaved(tmp_path, compact):
    """--streams S: interleaved requests from distinct streams batch into
    one vmapped step with per-stream state isolation — per-stream frame
    counters advance independently, a same-stream pair in one batch is
    split (in-stream order is a state dependency), a full batch answers
    both requests, and a single-stream reset leaves the others running.

    ``--compact 3`` exercises the compact-first variant through the CLI:
    capacity covers the 2+1 valid dets, so the protocol trajectory is
    identical."""
    rng = np.random.default_rng(3)
    H, W, M = 96, 192, 400
    proj = np.array([[100.0, 0, W / 2, 0], [0, 100.0, H / 2, 0],
                     [0, 0, 1, 0]], np.float32)

    def frame(path, seed, n_boxes):
        r = np.random.default_rng(seed)
        img = r.integers(0, 255, (H, W, 3)).astype(np.uint8)
        cloud = np.zeros((M, 4), np.float32)
        cloud[:, 2] = r.uniform(2, 30, M)
        boxes = np.stack([np.array([10 + 40 * i, 10, 40 + 40 * i, 50],
                                   np.float32) for i in range(n_boxes)])
        np.savez(path, image=img, cloud=cloud, boxes=boxes, proj=proj)

    for t in range(3):
        frame(tmp_path / f"a{t}.npz", 10 + t, 2)
        frame(tmp_path / f"b{t}.npz", 20 + t, 1)

    proc = subprocess.Popen(
        [sys.executable, "-m", "mmmot_tpu.cli.serve",
         "--config", "experiments/tiny_debug/config.yaml", "--cpu",
         "--streams", "2", "--flush-ms", "30"]
        + (["--compact", compact] if compact else []),
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        env=dict(os.environ))
    try:
        assert json.loads(proc.stdout.readline())["streams"] == 2

        def send(obj):
            proc.stdin.write(json.dumps(obj) + "\n")
            proc.stdin.flush()

        def recv():
            return json.loads(proc.stdout.readline())

        # Full batch: both streams' frames answered from ONE flush,
        # responses in request order, tagged by stream.
        send({"npz": str(tmp_path / "a0.npz"), "stream": "a"})
        send({"npz": str(tmp_path / "b0.npz"), "stream": "b"})
        ra, rb = recv(), recv()
        assert (ra["stream"], ra["frame"], len(ra["ids"])) == ("a", 0, 2)
        assert (rb["stream"], rb["frame"], len(rb["ids"])) == ("b", 0, 1)

        # Partial batch (flush-ms timeout): a alone advances; b untouched.
        send({"npz": str(tmp_path / "a1.npz"), "stream": "a"})
        ra = recv()
        assert (ra["stream"], ra["frame"]) == ("a", 1)

        # Same-stream pair in flight: the dependency splits the batch.
        send({"npz": str(tmp_path / "b1.npz"), "stream": "b"})
        send({"npz": str(tmp_path / "b2.npz"), "stream": "b"})
        rb1, rb2 = recv(), recv()
        assert (rb1["frame"], rb2["frame"]) == (1, 2)

        # Per-stream reset: a restarts at frame 0, b keeps its counter.
        send({"cmd": "reset", "stream": "a"})
        assert recv()["ok"] is True
        send({"npz": str(tmp_path / "a2.npz"), "stream": "a"})
        assert recv()["frame"] == 0

        # A third distinct stream must be refused (slots exhausted)...
        send({"npz": str(tmp_path / "a0.npz"), "stream": "c"})
        assert "error" in recv()
        # ...while existing streams keep serving.
        send({"npz": str(tmp_path / "b0.npz"), "stream": "b"})
        assert recv()["frame"] == 3
        send({"cmd": "quit"})
        assert recv()["ok"] is True
    finally:
        proc.stdin.close()
        proc.wait(timeout=120)
    assert proc.returncode == 0
