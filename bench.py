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

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
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


def main():
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.configs import flagship
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import (TrackingModule,
                                   track_sequences_from_frames_batched)
    from mmmot_tpu.utils.jax_setup import setup_jax

    setup_jax()
    cfg = flagship(compute_dtype="bfloat16", max_dets=N, crop=CROP,
                   point_len=P)
    solver = os.environ.get("MMMOT_BENCH_SOLVER")
    if solver:
        import dataclasses

        cfg = cfg.replace(assoc=dataclasses.replace(cfg.assoc,
                                                    solver=solver))
    net = model_entry(cfg.model)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (S, T, H, W, 3)), jnp.uint8)
    clouds = np.zeros((S, T, M, 4), np.float32)
    clouds[..., 0] = rng.uniform(-25, 25, (S, T, M))
    clouds[..., 1] = rng.uniform(-3, 3, (S, T, M))
    clouds[..., 2] = rng.uniform(2, 70, (S, T, M))
    clouds[..., 3] = rng.uniform(0, 1, (S, T, M))
    clouds = jnp.asarray(clouds)
    proj = jnp.asarray([[720.0, 0, W / 2, 40.0],
                        [0, 720.0, H / 2, 1.0],
                        [0, 0, 1, 0.003]], jnp.float32)

    det_counts = rng.integers(3, 17, (S, T))   # KITTI val: ~3-16 cars/frame
    det_mask = jnp.asarray(
        np.arange(N)[None, None, :] < det_counts[..., None])
    cx = rng.uniform(100, W - 100, (S, T, N))
    cy = rng.uniform(100, H - 80, (S, T, N))
    bw = rng.uniform(40, 160, (S, T, N))
    bh = rng.uniform(30, 90, (S, T, N))
    boxes = jnp.asarray(np.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
        axis=-1).astype(np.float32))

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

    module = TrackingModule(net, variables, cfg.assoc)
    from mmmot_tpu.tracker.kitti_runner import _crop_window

    crop_window = CROP_WINDOW or _crop_window(
        np.asarray(boxes), np.asarray(det_mask), W)
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

    out = jax.block_until_ready(f(images, clouds, boxes, det_mask))
    dropped = int(np.asarray(out["n_dropped"]).sum())
    assert dropped == 0, f"{dropped} detections dropped; raise COMPACT"

    prof_dir = os.environ.get("MMMOT_BENCH_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            out = jax.block_until_ready(f(images, clouds, boxes, det_mask))

    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = f(images, clouds, boxes, det_mask)
        # Fetch a real output (not just block_until_ready): under the axon
        # tunnel, block_until_ready can resolve early for some executables;
        # a host transfer provably waits for execution.  (Verified both
        # agree for this pipeline: 323.4 vs 323.5 FPS.)
        np.asarray(out["ids"])
    dt = (time.perf_counter() - t0) / n_runs

    fps = (S * T) / dt
    print(json.dumps({
        "metric": "kitti_tracking_fps_per_chip",
        "value": round(fps / n_dev, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / n_dev / BASELINE_FPS, 3),
        "config": {"crop": CROP, "point_len": P, "S": S, "T": T, "N": N,
                   "compact": compact, "chunk": CHUNK,
                   "crop_window": crop_window,
                   "dropped_dets": dropped, "devices": n_dev,
                   "aggregate_fps": round(fps, 2)},
    }))


if __name__ == "__main__":
    main()
