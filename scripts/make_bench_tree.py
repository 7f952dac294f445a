"""Fabricate a KITTI-scale tracking tree for runner benchmarking/training.

Full-resolution 384x1248 frames, ~12 detections/frame, 4 sequences x 200
frames (~1.3 GB).  Each track carries a distinct appearance (per-track
color + stripe texture painted into its box) and a LiDAR cluster at a
track-specific depth inside its frustum, so the REAL data path (PNG
decode -> on-device crop/frustum -> appearance+point nets -> association)
is learnable end-to-end, not just benchmarkable.  Usage:

    python scripts/make_bench_tree.py [root]

then point a config's data.root at it and run the track/train CLIs (see
docs/PERFORMANCE.md and docs/KITTI.md).

Detection sources written:

* (none) — oracle mode: `label_02` GT doubles as detections;
* ``detections/noisy/<seq>.txt`` — a realistic DETECTOR simulation over
  the same GT (the non-saturated quality regime, VERDICT r2 missing #5):
  box jitter proportional to size, per-track dropout BURSTS (1-3 frames —
  the regime where `assoc.revival_window` earns its keep) plus i.i.d.
  misses, and false positives (some on background, some overlapping real
  tracks) with a score distribution that OVERLAPS the true-positive one,
  so post-hoc thresholding has a real operating-point trade-off.
"""
import os
import sys
from collections import defaultdict

import numpy as np

# Allow direct invocation (python scripts/make_bench_tree.py) without an
# installed package: the repo root must be on sys.path BEFORE the package
# import below.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from mmmot_tpu.data.kitti_io import KittiObject, write_kitti_result

H, W = 384, 1248
P2 = np.array([[720.0, 0.0, 624.0, 0.0], [0.0, 720.0, 192.0, 0.0],
               [0.0, 0.0, 1.0, 0.0]])


def _box_iou(a, b):
    l = max(a[0], b[0]); t = max(a[1], b[1])
    r = min(a[2], b[2]); bo = min(a[3], b[3])
    inter = max(0.0, r - l) * max(0.0, bo - t)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(ua - inter, 1e-9)


def _noisy_dets(objs, T, rng, burst_rate=2.0, iid_miss=0.02,
                jitter=0.02, fp_rate=1.2, occl_dropout=False):
    """Simulate a detector over per-sequence GT ``objs`` (see module doc).

    ``occl_dropout``: OCCLUSION-CORRELATED misses (the adversarial
    regime): whenever two GT boxes overlap (IoU > 0.3), the smaller one is
    dropped with high probability for exactly those frames — misses now
    cluster at crossings, where identity is hardest, instead of landing
    at random times like the burst/i.i.d. model.
    """
    by_track = defaultdict(list)
    for o in objs:
        by_track[o.track_id].append(o)
    by_frame = defaultdict(list)
    for o in objs:
        by_frame[o.frame].append(o)

    occluded = set()            # (frame, track_id) pairs to drop
    if occl_dropout:
        for t, frame_objs in by_frame.items():
            for i, a in enumerate(frame_objs):
                for b in frame_objs[i + 1:]:
                    if _box_iou(a.bbox, b.bbox) > 0.3:
                        small = a if ((a.bbox[2] - a.bbox[0])
                                      * (a.bbox[3] - a.bbox[1])
                                      < (b.bbox[2] - b.bbox[0])
                                      * (b.bbox[3] - b.bbox[1])) else b
                        if rng.random() < 0.85:
                            occluded.add((t, small.track_id))

    dets = []
    for k in sorted(by_track):
        tobjs = sorted(by_track[k], key=lambda o: o.frame)
        frames = [o.frame for o in tobjs]
        drop = set()
        for _ in range(rng.poisson(burst_rate)):
            f0 = int(rng.choice(frames))
            drop.update(range(f0, f0 + int(rng.integers(1, 4))))
        for o in tobjs:
            if o.frame in drop or rng.random() < iid_miss \
                    or (o.frame, o.track_id) in occluded:
                continue
            l, t, r, b = [float(x) for x in o.bbox]
            w, h = r - l, b - t
            jl, jr = rng.normal(0, jitter * w, 2)
            jt, jb = rng.normal(0, jitter * h, 2)
            box = np.array([
                np.clip(l + jl, 0, W - 8), np.clip(t + jt, 0, H - 8),
                np.clip(r + jr, 8, W), np.clip(b + jb, 8, H)])
            if box[2] - box[0] < 8 or box[3] - box[1] < 8:
                continue
            jnorm = (abs(jl) + abs(jr)) / w + (abs(jt) + abs(jb)) / h
            score = float(np.clip(rng.normal(0.88, 0.06) - 0.5 * jnorm,
                                  0.05, 1.0))
            dets.append(KittiObject(
                frame=o.frame, track_id=0, obj_type=o.obj_type, bbox=box,
                dimensions=o.dimensions, location=o.location,
                rotation_y=o.rotation_y, score=score))
    classes = sorted({o.obj_type for o in objs}) or ["Car"]
    for t in range(T):
        for _ in range(rng.poisson(fp_rate)):
            cls = classes[int(rng.integers(len(classes)))]
            if cls == "Pedestrian":
                w = rng.uniform(18, 45)
                h = rng.uniform(45, 90)
            else:
                w = rng.uniform(40, 160)
                h = rng.uniform(30, 80)
            anchors = by_frame.get(t, [])
            if anchors and rng.random() < 0.3:
                # Overlapping-FP: offset ~half a box from a real track, so
                # its crop is partially textured (the hard negatives).
                a = anchors[int(rng.integers(len(anchors)))]
                al, at, ar, ab = [float(x) for x in a.bbox]
                cx = (al + ar) / 2 + rng.choice([-1, 1]) * (ar - al) * 0.6
                cy = (at + ab) / 2 + rng.normal(0, (ab - at) * 0.2)
            else:
                cx = rng.uniform(30, W - 30)
                cy = rng.uniform(100, 300)
            box = np.array([
                np.clip(cx - w / 2, 0, W - 8), np.clip(cy - h / 2, 0, H - 8),
                np.clip(cx + w / 2, 8, W), np.clip(cy + h / 2, 8, H)])
            if box[2] - box[0] < 8 or box[3] - box[1] < 8:
                continue
            score = float(np.clip(rng.normal(0.45, 0.15), 0.05, 1.0))
            dets.append(KittiObject(
                frame=t, track_id=0, obj_type=cls, bbox=box,
                dimensions=np.array([1.6, 1.8, 4.2]),
                location=np.array([(cx - 624.0) / 30.0, 1.6, 25.0]),
                rotation_y=0.0, score=score))
    dets.sort(key=lambda o: o.frame)
    for i, o in enumerate(dets):
        o.track_id = i
    return dets


def build_tree(root, n_seqs=4, T=200, seed=7, noisy=True, pedestrians=0,
               n_cars=16, clone_groups=0, occl_dropout=False):
    """``pedestrians`` adds that many Pedestrian tracks per sequence
    (smaller, slower boxes; distinct track-id range) — multi-class trees
    for ``track_class`` runs.  Default 0 keeps existing trees and their
    packed-cache keys byte-identical.

    Adversarial regime knobs (VERDICT r3 #4 — make association HARD):

    * ``clone_groups`` > 0: car appearances come from only that many
      distinct (color, stripe) signatures — tracks within a group are
      IDENTICAL in texture, so appearance alone cannot separate them and
      the association must lean on context (GNN rounds / spatial prior).
      Clones of a group share a y-band and get opposing velocities, so
      they actually CROSS.
    * ``n_cars`` > 16: crowded frames (push the valid count toward N).
    * ``occl_dropout``: the noisy detector drops occluded (smaller)
      boxes exactly while boxes overlap — misses cluster at crossings.
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    for si in range(n_seqs):
        seq = f"{si:04d}"
        for sub in (f"image_02/{seq}", f"velodyne/{seq}"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        os.makedirs(os.path.join(root, "label_02"), exist_ok=True)
        os.makedirs(os.path.join(root, "calib"), exist_ok=True)
        # tracks: n_cars cars moving linearly, plus optional pedestrians
        # (narrow, tall, slow, id range 100+)
        n_tracks = n_cars + pedestrians
        x0 = rng.uniform(50, W - 200, n_tracks)
        y0 = rng.uniform(120, 260, n_tracks)
        vx = np.concatenate([rng.uniform(-2.5, 2.5, n_cars),
                             rng.uniform(-0.8, 0.8, pedestrians)])
        bw = np.concatenate([rng.uniform(60, 180, n_cars),
                             rng.uniform(22, 45, pedestrians)])
        bh = np.concatenate([rng.uniform(40, 80, n_cars),
                             rng.uniform(55, 95, pedestrians)])
        color = rng.integers(40, 255, (n_tracks, 3))
        stripe = rng.integers(6, 24, n_tracks)      # texture frequency
        depth = rng.uniform(8, 60, n_tracks)        # LiDAR cluster depth
        if clone_groups:
            # Identical-appearance clones: one signature per group; group
            # members share a y-band and alternate velocity sign so their
            # paths cross (the regime where look-alikes must be separated
            # by context, not texture).
            g_color = rng.integers(40, 255, (clone_groups, 3))
            g_stripe = rng.integers(6, 24, clone_groups)
            g_y = rng.uniform(120, 240, clone_groups)
            g_w = rng.uniform(70, 150, clone_groups)
            g_h = rng.uniform(45, 75, clone_groups)
            for k in range(n_cars):
                g = k % clone_groups
                color[k] = g_color[g]
                stripe[k] = g_stripe[g]
                y0[k] = g_y[g] + rng.uniform(-8, 8)
                bw[k] = g_w[g]
                bh[k] = g_h[g]
                vx[k] = (1 if (k // clone_groups) % 2 == 0 else -1) * \
                    rng.uniform(1.2, 2.5)
        # Contiguous visibility spans (enter/exit, no blinking): association
        # is strictly adjacent-frame by default (like the reference), so any
        # within-track gap necessarily costs an ID switch at reappearance —
        # periodic gaps capped MOTA at ~68% regardless of model quality.
        # (The NOISY detection source reintroduces gaps as detector bursts;
        # that regime is scored against this full GT, and revival_window
        # addresses it.)
        t_in = rng.integers(0, T // 4, n_tracks)
        t_out = rng.integers(3 * T // 4, T + 1, n_tracks)
        objs = []
        for t in range(T):
            img = rng.integers(0, 60, (H, W, 3)).astype(np.uint8)
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
                patch = np.tile(color[k][None, None, :],
                                (bi - ti, ri - li, 1))
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
                is_ped = k >= n_cars
                objs.append(KittiObject(
                    frame=t, track_id=(100 + k - n_cars) if is_ped else k,
                    obj_type="Pedestrian" if is_ped else "Car",
                    bbox=np.array([l, tp, l + bw[k], tp + bh[k]]),
                    dimensions=(np.array([1.8, 0.6, 0.8]) if is_ped
                                else np.array([1.6, 1.8, 4.2])),
                    location=np.array([(cx - 624.0) / 30.0, 1.6, 25.0]),
                    rotation_y=0.0))
            pc = np.concatenate(pc_parts).astype(np.float32)
            rng.shuffle(pc)     # interleave clusters in scan order
            Image.fromarray(img).save(
                os.path.join(root, f"image_02/{seq}/{t:06d}.png"))
            pc.tofile(os.path.join(root, f"velodyne/{seq}/{t:06d}.bin"))
        write_kitti_result(objs, os.path.join(root, "label_02",
                                              f"{seq}.txt"))
        if noisy:
            os.makedirs(os.path.join(root, "detections", "noisy"),
                        exist_ok=True)
            dets = _noisy_dets(objs, T, np.random.default_rng(seed + 100
                                                              + si),
                               occl_dropout=occl_dropout)
            write_kitti_result(dets, os.path.join(
                root, "detections", "noisy", f"{seq}.txt"))
        with open(os.path.join(root, "calib", f"{seq}.txt"), "w") as f:
            f.write("P2: " + " ".join(str(x) for x in P2.ravel()) + "\n")
            f.write("R_rect " + " ".join(str(x) for x in np.eye(3).ravel())
                    + "\n")
            f.write("Tr_velo_cam " + " ".join(str(x) for x in np.array(
                [[0.0, -1, 0, 0], [0, 0, -1, 0],
                 [1, 0, 0, 0]]).ravel()) + "\n")
    print("tree at", root)


if __name__ == "__main__":
    build_tree(sys.argv[1] if len(sys.argv) > 1 else "/tmp/kitti_bench")
