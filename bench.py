"""Benchmark: KITTI-scale tracking throughput on one chip.

Runs the flagship tracking pipeline (VGG16-bn skip-pool appearance +
PointNet + attention fusion + affinity/new/end heads + in-graph association)
over batched synthetic KITTI-scale sequences and reports frames/sec/chip.

Workload: S sequences x T frames, N padded detection slots per frame with
KITTI-like valid density, crop HxW, P points/det — all configurable below.
``vs_baseline`` compares against the reference's ~50 FPS single-GPU online
tracker (KITTI leaderboard runtime ~0.02 s/frame; BASELINE.md).

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 50.0  # reference: ~0.02 s/frame on GPU (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.configs import flagship
    from mmmot_tpu.config import AssocConfig
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequences_batched
    from mmmot_tpu.utils.jax_setup import setup_jax

    setup_jax()

    # Workload shape (KITTI-like): tune S for chip occupancy.
    S, T, N, P = 4, 32, 32, 256
    CROP = 112  # reference crops detections to a fixed patch; bf16 compute
    cfg = flagship(compute_dtype="bfloat16", max_dets=N, crop=CROP,
                   point_len=P)
    net = model_entry(cfg.model)

    rng = np.random.default_rng(0)
    det_counts = rng.integers(3, 17, (S, T))   # KITTI val: ~3-16 cars/frame
    det_mask = np.arange(N)[None, None, :] < det_counts[..., None]
    crops = jnp.asarray(
        rng.normal(0, 1, (S, T, N, CROP, CROP, 3)).astype(np.float32))
    points = jnp.asarray(
        rng.normal(0, 1, (S, T, N, P, 4)).astype(np.float32))
    point_mask = jnp.ones((S, T, N, P), bool)
    det_mask = jnp.asarray(det_mask)

    batch = {"crops": np.asarray(crops[:, :2]),
             "points": np.asarray(points[:, :2]),
             "point_mask": np.asarray(point_mask[:, :2]),
             "det_mask": np.asarray(det_mask[:, :2])}
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = jax.jit(
        lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)

    module = TrackingModule(net, variables, AssocConfig(solver="auction"))
    f = jax.jit(lambda c, p, pm, dm: track_sequences_batched(
        module, c, p, pm, dm))

    # Warm-up / compile.
    out = jax.block_until_ready(f(crops, points, point_mask, det_mask))

    # Timed steady-state runs.
    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = jax.block_until_ready(f(crops, points, point_mask, det_mask))
    dt = (time.perf_counter() - t0) / n_runs

    frames = S * T
    fps = frames / dt
    print(json.dumps({
        "metric": "kitti_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
