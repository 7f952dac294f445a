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

    Ignore-semantics GT (build_tree's vans/dontcare_regions/truncated_cars
    knobs) is simulated faithfully too: Van and truncated GT still fire
    the detector (real detectors cannot tell a van from a car, nor skip a
    half-visible one) — the devkit must ABSORB the tracker's boxes on
    them instead of counting FP; DontCare regions additionally attract
    clutter FPs fully inside the region (absorbed by IoA > 0.5).
    """
    dontcare = [o for o in objs if o.obj_type == "DontCare"]
    objs = [o for o in objs if o.obj_type != "DontCare"]
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
    # FP types are drawn from the TRACKABLE classes only (a Van-typed FP
    # would be an ignored row, not a false positive).
    classes = sorted({o.obj_type for o in objs
                      if o.obj_type != "Van"}) or ["Car"]
    for t in range(T):
        for _ in range(rng.poisson(fp_rate)):
            cls = classes[int(rng.integers(len(classes)))]
            if cls == "Pedestrian":
                w = rng.uniform(18, 45)
                h = rng.uniform(45, 90)
            elif cls == "Cyclist":
                w = rng.uniform(25, 60)
                h = rng.uniform(40, 80)
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
    # Clutter FPs fully inside DontCare regions: the devkit must absorb
    # them (intersection-over-detection-area > 0.5), not count FP.
    dc_uniq = sorted({tuple(float(x) for x in o.bbox) for o in dontcare})
    for t in range(T):
        for (dl, dt, dr, db) in dc_uniq:
            if rng.random() >= 0.35:
                continue
            w = (dr - dl) * rng.uniform(0.45, 0.75)
            h = (db - dt) * rng.uniform(0.45, 0.75)
            cx = rng.uniform(dl + w / 2, dr - w / 2)
            cy = rng.uniform(dt + h / 2, db - h / 2)
            score = float(np.clip(rng.normal(0.5, 0.15), 0.05, 1.0))
            dets.append(KittiObject(
                frame=t, track_id=0, obj_type="Car",
                bbox=np.array([cx - w / 2, cy - h / 2,
                               cx + w / 2, cy + h / 2]),
                dimensions=np.array([1.6, 1.8, 4.2]),
                location=np.array([(cx - 624.0) / 30.0, 1.6, 25.0]),
                rotation_y=0.0, score=score))
    dets.sort(key=lambda o: o.frame)
    for i, o in enumerate(dets):
        o.track_id = i
    return dets


def build_tree(root, n_seqs=4, T=200, seed=7, noisy=True, pedestrians=0,
               n_cars=16, clone_groups=0, occl_dropout=False, cyclists=0,
               vans=0, dontcare_regions=0, truncated_cars=0):
    """``pedestrians`` adds that many Pedestrian tracks per sequence
    (smaller, slower boxes; distinct track-id range) — multi-class trees
    for ``track_class`` runs.  Default 0 keeps existing trees and their
    packed-cache keys byte-identical.

    Ignore-semantics / third-class knobs (all default 0 = byte-identical
    trees; exercised by scripts/real_quality_run.py --distractors and the
    multiclass run so the devkit's ignore machinery fires on the REAL
    runner -> txt -> devkit path, not just in unit tests):

    * ``cyclists``: Cyclist tracks (id range 200+) — the KITTI third class.
    * ``vans``: Van GT tracks (id 300+).  The noisy detector fires on them
      (type Van; the dataset's car filter tracks vans WITH cars and writes
      them as Car rows) — the devkit must ignore the Van GT for the Car
      class and ABSORB the tracker's rows on them.
    * ``dontcare_regions``: static DontCare GT regions painted with dim
      clutter; the noisy detector emits clutter FPs inside them (absorbed
      by intersection-over-area > 0.5).
    * ``truncated_cars``: Car tracks pinned at the image edge with ~35%
      of the box clipped — their GT rows carry the true truncation
      fraction (> the devkit's 0.15 threshold), so they are ignored GT:
      not FN when missed, absorbing when tracked.

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
        # (narrow, tall, slow, id range 100+), cyclists (200+), vans
        # (300+), and edge-truncated cars (400+).  Segment bounds:
        n_ped_end = n_cars + pedestrians
        n_cyc_end = n_ped_end + cyclists
        n_van_end = n_cyc_end + vans
        n_tracks = n_van_end + truncated_cars
        x0 = rng.uniform(50, W - 200, n_tracks)
        y0 = rng.uniform(120, 260, n_tracks)
        vx = np.concatenate([rng.uniform(-2.5, 2.5, n_cars),
                             rng.uniform(-0.8, 0.8, pedestrians),
                             rng.uniform(-1.6, 1.6, cyclists),
                             rng.uniform(-2.0, 2.0, vans),
                             rng.uniform(-0.3, 0.3, truncated_cars)])
        bw = np.concatenate([rng.uniform(60, 180, n_cars),
                             rng.uniform(22, 45, pedestrians),
                             rng.uniform(28, 60, cyclists),
                             rng.uniform(90, 200, vans),
                             rng.uniform(90, 170, truncated_cars)])
        bh = np.concatenate([rng.uniform(40, 80, n_cars),
                             rng.uniform(55, 95, pedestrians),
                             rng.uniform(45, 80, cyclists),
                             rng.uniform(50, 95, vans),
                             rng.uniform(40, 80, truncated_cars)])
        # Truncated cars are PINNED at an image edge: the box center sits
        # at 0.15 * width from the border, so ~35% of the box is clipped
        # every frame (> the devkit's 0.15 truncation threshold).
        for j in range(n_van_end, n_tracks):
            if (j - n_van_end) % 2 == 0:
                x0[j] = bw[j] * 0.15
            else:
                x0[j] = W - bw[j] * 0.15
        # Static clutter regions scored as DontCare GT.
        dc_boxes = []
        for _ in range(dontcare_regions):
            dw = rng.uniform(60, 150)
            dh = rng.uniform(30, 60)
            dl = rng.uniform(10, W - 160)
            dt = rng.uniform(100, 220)
            dc_boxes.append((float(dl), float(dt),
                             float(dl + dw), float(dt + dh)))
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
            for (dl, dt, dr, db) in dc_boxes:
                # Dim clutter texture inside DontCare regions, so the
                # detector's clutter FPs there have content to crop.
                img[int(dt):int(db), int(dl):int(dr)] = rng.integers(
                    0, 110, (int(db) - int(dt), int(dr) - int(dl), 3))
            pc_parts = [np.concatenate([
                rng.uniform(3, 70, (12000, 1)).astype(np.float32),
                rng.uniform(-30, 30, (12000, 1)).astype(np.float32),
                rng.uniform(-2, 2, (12000, 1)).astype(np.float32),
                rng.uniform(0, 1, (12000, 1)).astype(np.float32)], axis=1)]
            for k in range(n_tracks):
                cx = x0[k] + vx[k] * t
                is_trunc = k >= n_van_end
                if not (t_in[k] <= t < t_out[k]):
                    continue
                if not is_trunc and not (30 < cx < W - 30):
                    continue
                l, tp = cx - bw[k] / 2, y0[k] - bh[k] / 2
                li, ti = int(max(0, l)), int(max(0, tp))
                ri, bi = int(min(W, l + bw[k])), int(min(H, tp + bh[k]))
                if ri - li < 16 or bi - ti < 8:
                    continue
                # Per-track appearance: solid color + horizontal stripes.
                patch = np.tile(color[k][None, None, :],
                                (bi - ti, ri - li, 1))
                rows = (np.arange(ti, bi) // stripe[k]) % 2 == 0
                patch[rows] = 255 - patch[rows]
                img[ti:bi, li:ri] = patch
                # LiDAR cluster inside the frustum at the track's depth:
                # velodyne x fwd, y left, z up; u = 624 - 720*y/x.
                # Truncated tracks sample only the VISIBLE band so the
                # points stay inside the clipped detection's frustum.
                d = depth[k]
                if is_trunc:
                    u = rng.uniform(max(l, 0.0) + 2,
                                    min(l + bw[k], W) - 2, 400)
                else:
                    u = rng.uniform(l + 2, l + bw[k] - 2, 400)
                v = rng.uniform(tp + 2, tp + bh[k] - 2, 400)
                y_v = (624.0 - u) * d / 720.0
                z_v = (192.0 - v) * d / 720.0
                pc_parts.append(np.stack(
                    [np.full(400, d, np.float32), y_v.astype(np.float32),
                     z_v.astype(np.float32),
                     np.full(400, (k + 1) / n_tracks, np.float32)], axis=1))
                if k < n_cars:
                    otype, tid = "Car", k
                    dims = np.array([1.6, 1.8, 4.2])
                elif k < n_ped_end:
                    otype, tid = "Pedestrian", 100 + k - n_cars
                    dims = np.array([1.8, 0.6, 0.8])
                elif k < n_cyc_end:
                    otype, tid = "Cyclist", 200 + k - n_ped_end
                    dims = np.array([1.7, 0.6, 1.8])
                elif k < n_van_end:
                    otype, tid = "Van", 300 + k - n_cyc_end
                    dims = np.array([2.2, 1.9, 5.1])
                else:
                    otype, tid = "Car", 400 + k - n_van_end
                    dims = np.array([1.6, 1.8, 4.2])
                if is_trunc:
                    # GT bbox is the VISIBLE (clipped) box; the truncation
                    # field carries the clipped fraction like real KITTI.
                    lc, rc = max(l, 0.0), min(l + bw[k], float(W))
                    tc, bc = max(tp, 0.0), min(tp + bh[k], float(H))
                    trunc = 1.0 - ((rc - lc) * (bc - tc)) / (bw[k] * bh[k])
                    bbox = np.array([lc, tc, rc, bc])
                else:
                    trunc = 0.0
                    bbox = np.array([l, tp, l + bw[k], tp + bh[k]])
                objs.append(KittiObject(
                    frame=t, track_id=tid, obj_type=otype,
                    truncated=float(trunc), bbox=bbox, dimensions=dims,
                    location=np.array([(cx - 624.0) / 30.0, 1.6, 25.0]),
                    rotation_y=0.0))
            for (dl, dt, dr, db) in dc_boxes:
                objs.append(KittiObject(
                    frame=t, track_id=-1, obj_type="DontCare",
                    bbox=np.array([dl, dt, dr, db])))
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
