"""Benchmark: KITTI-scale tracking throughput on one chip.

Runs the flagship streaming pipeline end-to-end from RAW frames:
compact-first on-device per-detection crop extraction + frustum point
sampling (fused XLA preprocessing), VGG16-bn skip-pool appearance + PointNet
features, attention fusion, affinity/new/end heads, and in-graph auction
association — the whole sequence batch is one compiled program with no host
round-trips.

Workload: S sequences x T frames of full camera frames (uint8, KITTI-sized),
LiDAR clouds of M points, N padded detection slots with KITTI-like valid
density.  The default operating point is the REFERENCE-FAITHFUL scale (crop
224, point_len 512 — SURVEY.md §2.5/§2.6); override via env for experiments.
``vs_baseline`` compares against the reference's ~50 FPS single-GPU online
tracker (KITTI leaderboard runtime ~0.02 s/frame, BASELINE.md).

Harness-robustness design (round-2 verdict: the driver's bench run timed out
while the framework itself was healthy — the axon device tunnel stalls for
minutes on large host<->device transfers):

* the big arrays (frames ~740 MB, clouds ~130 MB) are generated ON DEVICE by
  a tiny jitted program — only KBs of boxes/masks cross the tunnel;
* staged heartbeat lines go to stderr (imported / inited / generated /
  compiled / each run), so a timeout tail pinpoints the stalled stage;
* a wall-clock deadline (MMMOT_BENCH_DEADLINE, default 420 s) trims the
  timed-run count so the final JSON line always lands before the driver's
  kill; at least one post-compile run is always timed.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} on
stdout (heartbeats are stderr-only).

Env knobs: MMMOT_BENCH_{S,T,N,P,CROP,CHUNK,COMPACT,CROP_WINDOW,SOLVER,
RUNS,DEADLINE,PROFILE}; MMMOT_BENCH_DET=1 benchmarks the reference-faithful
full-ILP mode (y_det detection-confidence variables in the LP -> sequential
scan; SURVEY.md §2.3/§3.2) instead of the parallel-presolve flagship.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 50.0  # reference: ~0.02 s/frame on GPU (BASELINE.md)

# Workload shape (KITTI-like); overridable for experiments via env.
S = int(os.environ.get("MMMOT_BENCH_S", 8))
# T=64 frames matches the KITTI runner's streaming window (real sequences
# are longer and stream through windows of this size); swept best
# (T=32: 393, T=48: 437, T=64: 442, T=128: 426 FPS).
T = int(os.environ.get("MMMOT_BENCH_T", 64))
N = int(os.environ.get("MMMOT_BENCH_N", 32))
P = int(os.environ.get("MMMOT_BENCH_P", 512))
H, W, M = 384, 1248, 16384
CROP = int(os.environ.get("MMMOT_BENCH_CROP", 224))
# Chunk the crop+conv stage so activations stay in HBM comfortably
# (S*CHUNK crops per conv step).
CHUNK = int(os.environ.get("MMMOT_BENCH_CHUNK", 32)) or None
# Crop band width: must cover the widest box; sized from the workload via
# the same helper the KITTI runner uses (0 = derive from boxes).
CROP_WINDOW = int(os.environ.get("MMMOT_BENCH_CROP_WINDOW", 0))
# Reference-faithful full-ILP mode: y_det vars in the LP, sequential scan.
DET_MODE = os.environ.get("MMMOT_BENCH_DET", "") not in ("", "0")
N_RUNS = int(os.environ.get("MMMOT_BENCH_RUNS", 3))
DEADLINE = float(os.environ.get("MMMOT_BENCH_DEADLINE", 420.0))

_T0 = time.perf_counter()
_STAGES: dict = {}


def hb(stage: str, msg: str = "") -> None:
    """Heartbeat: stage marker + elapsed wall-clock on stderr."""
    el = time.perf_counter() - _T0
    _STAGES[stage] = round(el, 2)
    print(f"[bench +{el:7.1f}s] {stage}{': ' if msg else ''}{msg}",
          file=sys.stderr, flush=True)


def remaining() -> float:
    return DEADLINE - (time.perf_counter() - _T0)


def main():
    hb("start", f"pid={os.getpid()} deadline={DEADLINE:.0f}s "
                f"det_mode={DET_MODE}")
    if os.environ.get("MMMOT_BENCH_CPU", "") not in ("", "0"):
        # debug/smoke runs off-TPU
        from mmmot_tpu.utils.jax_setup import force_cpu

        force_cpu()
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.configs import flagship
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import (TrackingModule,
                                   track_sequences_from_frames_batched)
    from mmmot_tpu.utils.jax_setup import setup_jax

    setup_jax()
    hb("jax_imported", f"devices={[str(d) for d in jax.devices()]}")

    cfg = flagship(compute_dtype="bfloat16", max_dets=N, crop=CROP,
                   point_len=P)
    import dataclasses
    solver = os.environ.get("MMMOT_BENCH_SOLVER")
    assoc = cfg.assoc
    if solver:
        assoc = dataclasses.replace(assoc, solver=solver)
    if DET_MODE:
        assoc = dataclasses.replace(assoc, use_det_scores=True)
    cfg = cfg.replace(assoc=assoc)
    net = model_entry(cfg.model)

    # Host-side: only the tiny arrays (boxes ~256 KB, masks ~16 KB) — the
    # frames/clouds are generated on device below, so no multi-hundred-MB
    # h2d transfer ever crosses the (stall-prone) tunnel.
    rng = np.random.default_rng(0)
    det_counts = rng.integers(3, 17, (S, T))   # KITTI val: ~3-16 cars/frame
    det_mask_h = np.arange(N)[None, None, :] < det_counts[..., None]
    cx = rng.uniform(100, W - 100, (S, T, N))
    cy = rng.uniform(100, H - 80, (S, T, N))
    bw = rng.uniform(40, 160, (S, T, N))
    bh = rng.uniform(30, 90, (S, T, N))
    boxes_h = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                       axis=-1).astype(np.float32)
    proj = jnp.asarray([[720.0, 0, W / 2, 40.0],
                        [0, 720.0, H / 2, 1.0],
                        [0, 0, 1, 0.003]], jnp.float32)

    # Compaction capacity: sized from the actual workload (known at pack
    # time for real KITTI too), rounded up to a chunk multiple.  Exact
    # sizing matters: extraction cost is linear in capacity/chunk
    # iterations (a full chunk of slack headroom measured -7% FPS), and
    # the n_dropped assert below catches any undersizing.
    chunk = CHUNK or 64
    max_valid = int(det_counts.sum(axis=1).max())
    compact = int(np.ceil(max_valid / chunk) * chunk)
    compact = int(os.environ.get("MMMOT_BENCH_COMPACT", compact))

    # Init params on a small dummy batch (shapes of crops/points only).
    dummy = {
        "crops": jnp.zeros((1, 2, 2, CROP, CROP, 3), jnp.float32),
        "points": jnp.zeros((1, 2, 2, P, 4), jnp.float32),
        "point_mask": jnp.ones((1, 2, 2, P), bool),
        "det_mask": jnp.ones((1, 2, 2), bool),
    }
    variables = jax.jit(
        lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), dummy)
    jax.block_until_ready(variables)
    hb("model_init", f"params inited (compact={compact})")

    # MMMOT_BENCH_PALLAS: "1" force the fused affinity kernel, "0" force
    # the XLA modules, unset = auto (kernel ON for the TPU backend).
    pal = os.environ.get("MMMOT_BENCH_PALLAS")
    module = TrackingModule(net, variables, cfg.assoc,
                            use_pallas_affinity=(None if pal is None
                                                 else pal == "1"))
    from mmmot_tpu.tracker.kitti_runner import _crop_window

    crop_window = CROP_WINDOW or _crop_window(boxes_h, det_mask_h, W)

    # On-device workload generation: KITTI-sized uint8 frames + uniform
    # clouds from jax.random — same distributions the host path used.
    @jax.jit
    def gen_workload(key):
        ki, kc = jax.random.split(key)
        images = jax.random.bits(ki, (S, T, H, W, 3), jnp.uint8)
        u = jax.random.uniform(kc, (S, T, M, 4), jnp.float32)
        lo = jnp.asarray([-25.0, -3.0, 2.0, 0.0], jnp.float32)
        hi = jnp.asarray([25.0, 3.0, 70.0, 1.0], jnp.float32)
        return images, lo + u * (hi - lo)

    images, clouds = gen_workload(jax.random.PRNGKey(42))
    boxes = jnp.asarray(boxes_h)
    det_mask = jnp.asarray(det_mask_h)
    jax.block_until_ready((images, clouds, boxes, det_mask))
    hb("workload", f"frames {images.shape} uint8 + clouds {clouds.shape} "
                   f"generated on device")

    f = jax.jit(lambda im, cl, bx, dm: track_sequences_from_frames_batched(
        module, im, cl, bx, dm, proj, (CROP, CROP), P,
        compact_capacity=compact, extract_chunk=CHUNK,
        crop_window=crop_window))

    # Multi-chip: shard the sequence axis over the mesh's data axis
    # (embarrassingly parallel; XLA partitions the whole pipeline).
    n_dev = jax.device_count()
    if n_dev > 1 and S % n_dev == 0:
        from mmmot_tpu.config import ParallelConfig
        from mmmot_tpu.parallel import make_mesh, shard_sequences

        mesh = make_mesh(ParallelConfig(num_data=n_dev))
        sharded = shard_sequences(mesh, {
            "images": images, "clouds": clouds, "boxes": boxes,
            "det_mask": det_mask})
        images, clouds = sharded["images"], sharded["clouds"]
        boxes, det_mask = sharded["boxes"], sharded["det_mask"]
    else:
        n_dev = 1

    # Explicit AOT compile so compile time and run time are separately
    # attributable in the heartbeat trail.
    tc = time.perf_counter()
    compiled = f.lower(images, clouds, boxes, det_mask).compile()
    hb("compiled", f"{time.perf_counter() - tc:.1f}s compile")

    run_times = []

    def timed_run():
        t0 = time.perf_counter()
        out = compiled(images, clouds, boxes, det_mask)
        # Fetch real outputs (not just block_until_ready): under the axon
        # tunnel, block_until_ready can resolve early for some executables;
        # a host transfer provably waits for execution.  ids is ~64 KB.
        ids = np.asarray(out["ids"])
        dropped = int(np.asarray(out["n_dropped"]).sum())
        dt = time.perf_counter() - t0
        return dt, ids, dropped

    dt, _, dropped = timed_run()
    assert dropped == 0, f"{dropped} detections dropped; raise COMPACT"
    run_times.append(dt)
    hb("run", f"1/{N_RUNS}: {dt:.2f}s ({S * T / dt:.1f} fps agg)")

    prof_dir = os.environ.get("MMMOT_BENCH_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            dt, _, _ = timed_run()
        hb("profiled", f"trace -> {prof_dir}")

    for i in range(1, N_RUNS):
        # Deadline guard: always leave room to print the JSON line — a
        # timed-out bench records NOTHING, which is strictly worse than
        # fewer repeats.
        if remaining() < 1.5 * run_times[-1] + 10.0:
            hb("deadline", f"skipping runs {i + 1}..{N_RUNS} "
                           f"({remaining():.0f}s left)")
            break
        dt, _, _ = timed_run()
        run_times.append(dt)
        hb("run", f"{i + 1}/{N_RUNS}: {dt:.2f}s ({S * T / dt:.1f} fps agg)")

    best = min(run_times)
    fps = (S * T) / best
    print(json.dumps({
        "metric": "kitti_tracking_fps_per_chip",
        "value": round(fps / n_dev, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / n_dev / BASELINE_FPS, 3),
        "config": {"crop": CROP, "point_len": P, "S": S, "T": T, "N": N,
                   "compact": compact, "chunk": CHUNK,
                   "crop_window": crop_window, "det_mode": DET_MODE,
                   "pallas_affinity": module.use_pallas_affinity,
                   "dropped_dets": dropped, "devices": n_dev,
                   "aggregate_fps": round(fps, 2),
                   "run_secs": [round(t, 3) for t in run_times],
                   "stage_secs": _STAGES},
    }), flush=True)


if __name__ == "__main__":
    main()
