"""Noisy-detector tree generator + FP-policy tracking smoke.

``scripts/make_bench_tree.py`` fabricates a full-resolution KITTI tree with
GT labels plus ``detections/noisy`` — box jitter, per-track dropout bursts,
i.i.d. misses, and background/track-overlapping false positives whose score
distribution overlaps the true positives.  This file locks the generator's
statistical contract (the noisy quality regression in
``scripts/real_quality_run.py`` depends on it discriminating FP policies)
and drives the y_det + revival tracker over the tree end-to-end on CPU.

Reference anchor: SURVEY.md §2.3 (y_det detection-confidence variables),
§6 (MOTA parity needs a non-saturated regime — VERDICT r2 missing #5).
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from scripts.make_bench_tree import build_tree  # noqa: E402

from mmmot_tpu.data.kitti_io import read_kitti_tracking_labels  # noqa: E402


def _iou(a, b):
    lx = max(a[0], b[0])
    ly = max(a[1], b[1])
    rx = min(a[2], b[2])
    ry = min(a[3], b[3])
    inter = max(0.0, rx - lx) * max(0.0, ry - ly)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("noisy") / "kitti")
    build_tree(root, n_seqs=1, T=24, seed=3)
    return root


def test_noisy_detector_statistics(tree):
    gt = read_kitti_tracking_labels(
        os.path.join(tree, "label_02", "0000.txt"))
    det = read_kitti_tracking_labels(
        os.path.join(tree, "detections", "noisy", "0000.txt"))
    n_gt = sum(len(v) for v in gt.values())
    assert n_gt > 0 and det, "generator produced an empty tree"

    tp_scores, fp_scores, matched = [], [], 0
    for fid, objs in det.items():
        for o in objs:
            assert o.score is not None and 0.0 <= o.score <= 1.0
            best = max((_iou(o.bbox, g.bbox) for g in gt.get(fid, [])),
                       default=0.0)
            if best >= 0.5:
                matched += 1
                tp_scores.append(o.score)
            elif best < 0.3:
                fp_scores.append(o.score)

    # False negatives: dropout bursts + iid misses leave GT uncovered.
    assert matched < n_gt, "no FN — the dropout model is dead"
    # False positives with the designed overlapping score distribution.
    assert len(fp_scores) >= 3, "no FP — the clutter model is dead"
    assert np.mean(tp_scores) > np.mean(fp_scores), \
        "scores carry no signal — thresholding could never work"
    assert min(tp_scores) < max(fp_scores), \
        "score distributions separable — thresholding would be perfect " \
        "and y_det could never beat it"


def test_noisy_tree_tracking_fp_policies(tree):
    import jax

    from mmmot_tpu.configs import tiny
    from mmmot_tpu.data.kitti_loader import KittiPairLoader
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule
    from mmmot_tpu.tracker.kitti_runner import track_kitti_sequences

    cfg = tiny(crop=32, max_dets=16, point_len=32)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, root=tree, det_source="noisy"))
    net = model_entry(cfg.model)
    loader = KittiPairLoader(cfg.data, seed=0, sequences=("0000",))
    b0 = next(loader.batches(2))
    variables = jax.jit(
        lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), b0)

    assoc = dataclasses.replace(cfg.assoc, use_det_scores=True,
                                raw_new_end=True, revival_window=2)
    module = TrackingModule(net, variables, assoc)
    out = os.path.join(tree, "..", "out_ydet")
    stats = track_kitti_sequences(module, cfg.data, out,
                                  sequences=["0000"], window=8,
                                  score_sweep=(0.97,), evaluate=True)
    m = stats["metrics"]
    assert np.isfinite(float(m.mota)) and np.isfinite(float(m.motp))
    rows = open(os.path.join(out, "0000.txt")).readlines()
    assert rows, "tracker emitted no result rows on the noisy tree"

    # Post-hoc threshold via score_sweep (one tracking pass): a near-1
    # threshold must strictly shrink the emitted rows (FP det-head scores
    # cap well below 1) and its metrics must be IDENTICAL to a separate
    # run with score_threshold set — the sweep is the same output filter.
    rows_sweep = open(os.path.join(out, "thr_0.97", "0000.txt")).readlines()
    assert len(rows_sweep) < len(rows)
    out_thr = os.path.join(tree, "..", "out_thr")
    ref = track_kitti_sequences(module, cfg.data, out_thr,
                                sequences=["0000"], window=8,
                                score_threshold=0.97, evaluate=True)
    rows_thr = open(os.path.join(out_thr, "0000.txt")).readlines()
    assert rows_thr == rows_sweep
    ms, mr = stats["sweep"][0.97], ref["metrics"]
    assert (ms.mota, ms.motp, ms.id_switches, ms.tp, ms.fp, ms.fn) == \
        (mr.mota, mr.motp, mr.id_switches, mr.tp, mr.fp, mr.fn)


def test_multiclass_tree_generation(tmp_path):
    """``pedestrians=K`` adds Pedestrian tracks (distinct id range, ped-
    sized boxes) and the noisy detector preserves classes — the multi-class
    ``track_class`` runs depend on both."""
    root = str(tmp_path / "kitti_mc")
    build_tree(root, n_seqs=1, T=16, seed=5, pedestrians=4)
    gt = read_kitti_tracking_labels(
        os.path.join(root, "label_02", "0000.txt"))
    gt_all = [o for objs in gt.values() for o in objs]
    cars = [o for o in gt_all if o.obj_type == "Car"]
    peds = [o for o in gt_all if o.obj_type == "Pedestrian"]
    assert cars and peds
    assert {o.track_id for o in peds} <= set(range(100, 104))
    assert all(o.track_id < 100 for o in cars)
    for o in peds:      # ped boxes are narrow and tall
        w, h = o.bbox[2] - o.bbox[0], o.bbox[3] - o.bbox[1]
        assert w <= 46 and h >= 20 and h > 0.9 * w

    dets = read_kitti_tracking_labels(
        os.path.join(root, "detections", "noisy", "0000.txt"))
    det_all = [o for objs in dets.values() for o in objs]
    det_cls = {o.obj_type for o in det_all}
    assert det_cls == {"Car", "Pedestrian"}
    # detector TPs keep their GT's class: every high-score ped det must
    # overlap a ped GT box (class never flips through the noise)
    for d in det_all:
        if d.obj_type != "Pedestrian" or (d.score or 0) < 0.75:
            continue
        assert any(_iou(d.bbox, g.bbox) > 0.3
                   for g in gt.get(d.frame, [])
                   if g.obj_type == "Pedestrian")


def test_distractor_tree_and_devkit_ignore_semantics(tmp_path):
    """The ignore-semantics knobs (cyclists/vans/dontcare_regions/
    truncated_cars) emit the GT the devkit's ignore machinery exists for,
    the noisy detector fires on it faithfully (Van dets, clutter FPs
    inside DontCare), and the devkit ABSORBS tracker boxes on ignored GT
    instead of counting FP — end-to-end through result rows, with the new
    absorbed/ignored_gt accounting."""
    from mmmot_tpu.data.kitti_io import KittiObject
    from mmmot_tpu.eval.kitti_devkit import TrackingEvaluation

    root = str(tmp_path / "kitti_dx")
    build_tree(root, n_seqs=1, T=16, seed=11, cyclists=2, vans=2,
               dontcare_regions=2, truncated_cars=2)
    gt = read_kitti_tracking_labels(
        os.path.join(root, "label_02", "0000.txt"))
    gt_all = [o for objs in gt.values() for o in objs]
    by_type = {}
    for o in gt_all:
        by_type.setdefault(o.obj_type, []).append(o)
    assert set(by_type) >= {"Car", "Cyclist", "Van", "DontCare"}
    assert {o.track_id for o in by_type["Cyclist"]} <= set(range(200, 202))
    assert {o.track_id for o in by_type["Van"]} <= set(range(300, 302))
    # Edge-truncated cars: id range 400+, truncation above the devkit
    # threshold, bbox clipped to the image.
    trunc = [o for o in by_type["Car"] if o.track_id >= 400]
    assert trunc and all(o.truncated > 0.15 for o in trunc)
    assert all(o.bbox[0] >= 0 and o.bbox[2] <= 1248 for o in trunc)
    # Regular cars keep truncation 0 (byte-compat with existing trees).
    assert all(o.truncated == 0.0 for o in by_type["Car"]
               if o.track_id < 400)

    dets = read_kitti_tracking_labels(
        os.path.join(root, "detections", "noisy", "0000.txt"))
    det_all = [o for objs in dets.values() for o in objs]
    assert all(o.obj_type != "DontCare" for o in det_all), \
        "DontCare GT must never produce detections"
    assert any(o.obj_type == "Van" for o in det_all), \
        "the detector must fire on Van distractors"
    dc_boxes = [o.bbox for o in by_type["DontCare"]]
    in_dc = [d for d in det_all if d.obj_type == "Car" and any(
        _iou(d.bbox, b) > 0.25 for b in dc_boxes)]
    assert in_dc, "no clutter FPs inside DontCare regions"

    # Devkit absorption e2e: a tracker that emits Car rows exactly on the
    # Van GT, the truncated GT, and inside a DontCare region must see them
    # ABSORBED (fp == 0), with the ignored-GT counting surfaced.
    trk = {}
    n_rows = 0
    for f, objs in gt.items():
        rows = []
        for o in objs:
            if o.obj_type == "Van" or (o.obj_type == "Car"
                                       and o.truncated > 0.15):
                rows.append(KittiObject(
                    frame=f, track_id=900 + o.track_id, obj_type="Car",
                    bbox=o.bbox.copy(), score=0.9))
            elif o.obj_type == "DontCare":
                l, t, r, b = [float(x) for x in o.bbox]
                w, h = (r - l) * 0.6, (b - t) * 0.6
                cx, cy = (l + r) / 2, (t + b) / 2
                rows.append(KittiObject(
                    frame=f, track_id=990, obj_type="Car",
                    bbox=np.array([cx - w / 2, cy - h / 2,
                                   cx + w / 2, cy + h / 2]), score=0.9))
        n_rows += len(rows)
        trk[f] = rows
    ev = TrackingEvaluation(cls="car")
    ev.add_sequence(gt, trk)
    m = ev.compute()
    assert n_rows > 0
    assert m.fp == 0, "ignored-GT / DontCare rows must be absorbed"
    assert m.absorbed == n_rows
    assert m.ignored_gt > 0
    # Van + truncated GT must not count FN either (they are ignored, and
    # this tracker emitted nothing on the real cars).
    n_real_car_gt = sum(1 for o in by_type["Car"]
                        if o.track_id < 400)
    assert m.fn == n_real_car_gt
