"""Fabricate a KITTI-scale tracking tree for runner benchmarking/training.

Full-resolution 384x1248 frames, ~12 detections/frame, 4 sequences x 200
frames (~1.3 GB).  Each track carries a distinct appearance (per-track
color + stripe texture painted into its box) and a LiDAR cluster at a
track-specific depth inside its frustum, so the REAL data path (PNG
decode -> on-device crop/frustum -> appearance+point nets -> association)
is learnable end-to-end, not just benchmarkable.  Usage:

    python scripts/make_bench_tree.py [root]

then point a config's data.root at it and run the track/train CLIs (see
docs/PERFORMANCE.md).  Oracle mode: GT doubles as detections.
"""
import os
import sys

import numpy as np
from PIL import Image

from mmmot_tpu.data.kitti_io import KittiObject, write_kitti_result

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kitti_bench"
P2 = np.array([[720.0, 0.0, 624.0, 0.0], [0.0, 720.0, 192.0, 0.0],
               [0.0, 0.0, 1.0, 0.0]])
rng = np.random.default_rng(7)
H, W = 384, 1248
for si in range(4):
    seq = f"{si:04d}"
    T = 200
    for sub in (f"image_02/{seq}", f"velodyne/{seq}"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "label_02"), exist_ok=True)
    os.makedirs(os.path.join(root, "calib"), exist_ok=True)
    # tracks: 16 cars moving linearly; ~12 visible per frame
    n_tracks = 16
    x0 = rng.uniform(50, W - 200, n_tracks)
    y0 = rng.uniform(120, 260, n_tracks)
    vx = rng.uniform(-2.5, 2.5, n_tracks)
    bw = rng.uniform(60, 180, n_tracks)
    bh = rng.uniform(40, 80, n_tracks)
    color = rng.integers(40, 255, (n_tracks, 3))
    stripe = rng.integers(6, 24, n_tracks)          # texture frequency
    depth = rng.uniform(8, 60, n_tracks)            # LiDAR cluster depth (x fwd)
    # Contiguous visibility spans (enter/exit, no blinking): association
    # is strictly adjacent-frame (like the reference tracker), so any
    # within-track gap necessarily costs an ID switch at reappearance —
    # periodic gaps capped MOTA at ~68% regardless of model quality.
    t_in = rng.integers(0, T // 4, n_tracks)
    t_out = rng.integers(3 * T // 4, T + 1, n_tracks)
    objs = []
    for t in range(T):
        img = rng.integers(0, 60, (H, W, 3)).astype(np.uint8)  # dim noise bg
        # background points + per-track clusters
        pc_parts = [np.concatenate([
            rng.uniform(3, 70, (12000, 1)).astype(np.float32),
            rng.uniform(-30, 30, (12000, 1)).astype(np.float32),
            rng.uniform(-2, 2, (12000, 1)).astype(np.float32),
            rng.uniform(0, 1, (12000, 1)).astype(np.float32)], axis=1)]
        for k in range(n_tracks):
            cx = x0[k] + vx[k] * t
            if not (30 < cx < W - 30) or not (t_in[k] <= t < t_out[k]):
                continue
            l, tp = cx - bw[k] / 2, y0[k] - bh[k] / 2
            li, ti = int(max(0, l)), int(max(0, tp))
            ri, bi = int(min(W, l + bw[k])), int(min(H, tp + bh[k]))
            # Per-track appearance: solid color + horizontal stripes.
            patch = np.tile(color[k][None, None, :], (bi - ti, ri - li, 1))
            rows = (np.arange(ti, bi) // stripe[k]) % 2 == 0
            patch[rows] = 255 - patch[rows]
            img[ti:bi, li:ri] = patch
            # LiDAR cluster inside the frustum at the track's depth:
            # velodyne x fwd, y left, z up; u = 624 - 720*y/x.
            d = depth[k]
            u = rng.uniform(l + 2, l + bw[k] - 2, 400)
            v = rng.uniform(tp + 2, tp + bh[k] - 2, 400)
            y_v = (624.0 - u) * d / 720.0
            z_v = (192.0 - v) * d / 720.0
            pc_parts.append(np.stack(
                [np.full(400, d, np.float32), y_v.astype(np.float32),
                 z_v.astype(np.float32),
                 np.full(400, (k + 1) / n_tracks, np.float32)], axis=1))
            objs.append(KittiObject(
                frame=t, track_id=k, obj_type="Car",
                bbox=np.array([l, tp, l + bw[k], tp + bh[k]]),
                dimensions=np.array([1.6, 1.8, 4.2]),
                location=np.array([(cx - 624.0) / 30.0, 1.6, 25.0]),
                rotation_y=0.0))
        pc = np.concatenate(pc_parts).astype(np.float32)
        rng.shuffle(pc)         # interleave clusters in scan order
        Image.fromarray(img).save(
            os.path.join(root, f"image_02/{seq}/{t:06d}.png"))
        pc.tofile(os.path.join(root, f"velodyne/{seq}/{t:06d}.bin"))
    write_kitti_result(objs, os.path.join(root, "label_02", f"{seq}.txt"))
    with open(os.path.join(root, "calib", f"{seq}.txt"), "w") as f:
        f.write("P2: " + " ".join(str(x) for x in P2.ravel()) + "\n")
        f.write("R_rect " + " ".join(str(x) for x in np.eye(3).ravel()) + "\n")
        f.write("Tr_velo_cam " + " ".join(str(x) for x in np.array(
            [[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]]).ravel()) + "\n")
print("tree at", root)
