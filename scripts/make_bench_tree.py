"""Fabricate a KITTI-scale tracking tree for runner benchmarking.

Full-resolution 384x1248 frames, ~12 detections/frame, 4 sequences x 200
frames (~1.3 GB).  Usage:

    python scripts/make_bench_tree.py [root]

then point a config's data.root at it and run the track CLI (see
docs/PERFORMANCE.md).  Oracle mode: GT doubles as detections.
"""
import sys
import os
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
    objs = []
    for t in range(T):
        img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, f"image_02/{seq}/{t:06d}.png"))
        pc = np.zeros((18000, 4), np.float32)
        pc[:, 0] = rng.uniform(3, 70, 18000)
        pc[:, 1] = rng.uniform(-30, 30, 18000)
        pc[:, 2] = rng.uniform(-2, 2, 18000)
        pc[:, 3] = rng.uniform(0, 1, 18000)
        pc.tofile(os.path.join(root, f"velodyne/{seq}/{t:06d}.bin"))
        for k in range(n_tracks):
            cx = x0[k] + vx[k] * t
            if not (30 < cx < W - 30) or (t + k) % 4 == 3:
                continue
            l, tp = cx - bw[k] / 2, y0[k] - bh[k] / 2
            objs.append(KittiObject(
                frame=t, track_id=k, obj_type="Car",
                bbox=np.array([l, tp, l + bw[k], tp + bh[k]]),
                dimensions=np.array([1.6, 1.8, 4.2]),
                location=np.array([(cx - 624.0) / 30.0, 1.6, 25.0]),
                rotation_y=0.0))
    write_kitti_result(objs, os.path.join(root, "label_02", f"{seq}.txt"))
    with open(os.path.join(root, "calib", f"{seq}.txt"), "w") as f:
        f.write("P2: " + " ".join(str(x) for x in P2.ravel()) + "\n")
        f.write("R_rect " + " ".join(str(x) for x in np.eye(3).ravel()) + "\n")
        f.write("Tr_velo_cam " + " ".join(str(x) for x in np.array(
            [[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]]).ravel()) + "\n")
print("tree at", root)
