"""Devkit metrics port: hand-crafted scenarios with known answers."""

import numpy as np
import pytest

from mmmot_tpu.data.kitti_io import (KittiObject, read_kitti_tracking_labels,
                                     write_kitti_result)
from mmmot_tpu.eval import TrackingEvaluation

B1 = [100, 100, 200, 200]
B2 = [300, 100, 400, 200]
FAR = [600, 300, 700, 380]


def obj(frame, tid, box, typ="Car", trunc=0.0):
    return KittiObject(frame=frame, track_id=tid, obj_type=typ,
                       truncated=trunc, bbox=np.array(box, float))


def test_perfect_tracking():
    gt = {f: [obj(f, 1, B1), obj(f, 2, B2)] for f in range(5)}
    ev = TrackingEvaluation()
    ev.add_sequence(gt, gt, num_frames=5)
    m = ev.compute()
    assert m.mota == 1.0 and m.motp == 1.0 and m.id_switches == 0
    assert m.mt == 1.0 and m.fn == 0 and m.fp == 0


def test_ids_frag_mota():
    gt = {}
    for f in range(6):
        gt.setdefault(f, []).append(obj(f, 1, B1))
    for f in range(3):
        gt[f].append(obj(f, 2, B2))
    trk = {}
    for f in range(3):
        trk.setdefault(f, []).append(obj(f, 7, B1))
    for f in range(4, 6):
        trk.setdefault(f, []).append(obj(f, 8, B1))
    for f in range(3):
        trk[f].append(obj(f, 9, B2))
    trk.setdefault(5, []).append(obj(5, 99, FAR))
    ev = TrackingEvaluation()
    ev.add_sequence(gt, trk, num_frames=6)
    m = ev.compute()
    assert (m.tp, m.fn, m.fp) == (8, 1, 1)
    assert m.id_switches == 1 and m.fragments == 1
    assert m.mota == pytest.approx(1 - 3 / 9)
    assert m.mt == 1.0


def test_van_ignored_for_car():
    ev = TrackingEvaluation(cls="car")
    ev.add_sequence({0: [obj(0, 1, B1, "Van")]}, {0: [obj(0, 5, B1)]},
                    num_frames=1)
    m = ev.compute()
    assert (m.tp, m.fp, m.fn) == (0, 0, 0)


def test_dontcare_absorbs():
    ev = TrackingEvaluation(cls="car")
    ev.add_sequence({0: [obj(0, 1, [95, 95, 210, 210], "DontCare")]},
                    {0: [obj(0, 5, B1)]}, num_frames=1)
    assert ev.compute().fp == 0


def test_truncated_gt_ignored():
    ev = TrackingEvaluation(cls="car")
    ev.add_sequence({0: [obj(0, 1, B1, trunc=0.9)]}, {}, num_frames=1)
    assert ev.compute().fn == 0


def test_ml_classification():
    gt = {f: [obj(f, 1, B1)] for f in range(10)}
    trk = {0: [obj(0, 5, B1)]}   # 10% coverage -> ML
    ev = TrackingEvaluation()
    ev.add_sequence(gt, trk, num_frames=10)
    m = ev.compute()
    assert m.ml == 1.0 and m.mt == 0.0


def test_mt_ml_boundaries_strict():
    """Devkit boundaries are strict: 0.2 and 0.8 coverage are both PT."""
    gt = {f: [obj(f, 1, B1)] for f in range(10)}
    trk = {f: [obj(f, 5, B1)] for f in range(2)}     # 2/10 = 0.2 -> PT
    ev = TrackingEvaluation()
    ev.add_sequence(gt, trk, num_frames=10)
    m = ev.compute()
    assert m.pt == 1.0 and m.ml == 0.0
    trk8 = {f: [obj(f, 5, B1)] for f in range(8)}    # 8/10 = 0.8 -> PT
    ev8 = TrackingEvaluation()
    ev8.add_sequence(gt, trk8, num_frames=10)
    m8 = ev8.compute()
    assert m8.pt == 1.0 and m8.mt == 0.0
    trk9 = {f: [obj(f, 5, B1)] for f in range(9)}    # 0.9 -> MT
    ev9 = TrackingEvaluation()
    ev9.add_sequence(gt, trk9, num_frames=10)
    assert ev9.compute().mt == 1.0


def test_kitti_io_roundtrip(tmp_path):
    objs = [obj(0, 1, B1), obj(1, 1, [10.5, 20.25, 99.125, 150.0625]),
            obj(1, 2, B2)]
    objs[0].score = 0.875
    p = str(tmp_path / "0001.txt")
    write_kitti_result(objs, p)
    frames = read_kitti_tracking_labels(p)
    assert set(frames) == {0, 1}
    assert frames[0][0].score == 0.875
    np.testing.assert_allclose(frames[1][0].bbox,
                               [10.5, 20.25, 99.125, 150.0625])
    # 17 fields without score, 18 with
    lines = open(p).read().strip().split("\n")
    assert len(lines[0].split()) == 18
    assert len(lines[1].split()) == 17


def test_malformed_line_rejected():
    with pytest.raises(ValueError, match="malformed"):
        KittiObject.from_line("1 2 Car 0 0")


def test_pedestrian_class_eval():
    """Pedestrian evaluation: Person_sitting is the ignored class."""
    gt = {0: [obj(0, 1, B1, "Pedestrian"), obj(0, 2, B2, "Person_sitting")]}
    trk = {0: [obj(0, 5, B1, "Pedestrian"), obj(0, 6, B2, "Pedestrian")]}
    ev = TrackingEvaluation(cls="pedestrian")
    ev.add_sequence(gt, trk, num_frames=1)
    m = ev.compute()
    # Pedestrian matched (TP), Person_sitting absorbs the second box.
    assert (m.tp, m.fp, m.fn) == (1, 0, 0)
    # Cars in GT are irrelevant for pedestrian eval.
    gt2 = {0: [obj(0, 1, B1, "Car")]}
    ev2 = TrackingEvaluation(cls="pedestrian")
    ev2.add_sequence(gt2, {0: [obj(0, 5, FAR, "Pedestrian")]}, num_frames=1)
    m2 = ev2.compute()
    assert m2.fn == 0 and m2.fp == 1  # car ignored, stray ped det is FP


def test_moda_modp():
    """MODA has no IDS term; MODP averages per-frame mapped overlap."""
    gt = {f: [obj(f, 1, B1)] for f in range(4)}
    # Frames 0-1 tracked perfectly under one id, 2-3 under another: 1 IDS.
    trk = {0: [obj(0, 5, B1)], 1: [obj(1, 5, B1)],
           2: [obj(2, 6, B1)], 3: [obj(3, 6, B1)]}
    ev = TrackingEvaluation()
    ev.add_sequence(gt, trk, num_frames=4)
    m = ev.compute()
    assert m.id_switches == 1
    assert m.mota == pytest.approx(1 - 1 / 4)   # IDS hurts MOTA
    assert m.moda == pytest.approx(1.0)         # ...but not MODA
    assert m.modp == pytest.approx(1.0)         # perfect overlaps

    # Half-overlap boxes: MODP reflects localisation quality.
    half = [100, 100, 200, 150]                 # IoU 0.5 with B1
    trk2 = {f: [obj(f, 5, half)] for f in range(4)}
    ev2 = TrackingEvaluation()
    ev2.add_sequence(gt, trk2, num_frames=4)
    m2 = ev2.compute()
    assert m2.modp == pytest.approx(0.5, abs=1e-6)
    assert m2.moda == pytest.approx(1.0)


def test_tracker_class_filtering():
    """Tracker entries of other classes are ignored (devkit loadTracker)."""
    gt = {0: [obj(0, 1, B1)]}
    trk = {0: [obj(0, 5, B1), obj(0, 6, FAR, "Pedestrian")]}
    ev = TrackingEvaluation(cls="car")
    ev.add_sequence(gt, trk, num_frames=1)
    m = ev.compute()
    assert (m.tp, m.fp) == (1, 0)               # ped box is not a car FP
    assert m.n_tracker_trajectories == 1


def test_summary_and_per_sequence(tmp_path):
    import os

    from mmmot_tpu.eval.kitti_devkit import (evaluate_tracking,
                                             evaluate_tracking_all_classes)

    gt_dir = tmp_path / "gt"; res_dir = tmp_path / "res"
    gt_dir.mkdir(); res_dir.mkdir()
    for seq in ("0000", "0001"):
        gt = [obj(f, 1, B1) for f in range(3)]
        write_kitti_result(gt, str(gt_dir / f"{seq}.txt"))
        trk = [obj(f, 9, B1) for f in range(3 if seq == "0000" else 1)]
        write_kitti_result(trk, str(res_dir / f"{seq}.txt"))

    overall, per_seq = evaluate_tracking(
        str(gt_dir), str(res_dir), ["0000", "0001"],
        per_sequence=True, summary_dir=str(tmp_path / "out"))
    assert per_seq["0000"].mota == pytest.approx(1.0)
    assert per_seq["0001"].mota == pytest.approx(1 / 3)
    assert overall.mota == pytest.approx(1 - 2 / 6)
    assert overall.n_tracker_trajectories == 2

    text = open(tmp_path / "out" / "summary_car.txt").read()
    assert "Multiple Object Tracking Accuracy (MOTA)" in text
    assert "Multiple Object Detection Precision (MODP)" in text
    per_seq_txt = open(
        tmp_path / "out" / "summary_car_per_sequence.txt").read()
    assert "0000:" in per_seq_txt and "0001:" in per_seq_txt

    both = evaluate_tracking_all_classes(
        str(gt_dir), str(res_dir), ["0000", "0001"])
    assert set(both) == {"car", "pedestrian"}
    assert both["car"].mota == pytest.approx(overall.mota)
    assert both["pedestrian"].n_gt == 0


def test_mt_ml_boundary_closed_convention():
    """boundary="closed": exact-0.2 coverage counts ML and exact-0.8
    counts MT (the alternate convention kept selectable until the
    reference mount can settle the [VERIFY]; strict ships by default)."""
    gt = {f: [obj(f, 1, B1)] for f in range(10)}
    trk2 = {f: [obj(f, 5, B1)] for f in range(2)}     # 0.2 coverage
    ev = TrackingEvaluation(boundary="closed")
    ev.add_sequence(gt, trk2, num_frames=10)
    m = ev.compute()
    assert m.ml == 1.0 and m.pt == 0.0

    trk8 = {f: [obj(f, 5, B1)] for f in range(8)}     # 0.8 coverage
    ev8 = TrackingEvaluation(boundary="closed")
    ev8.add_sequence(gt, trk8, num_frames=10)
    m8 = ev8.compute()
    assert m8.mt == 1.0 and m8.pt == 0.0

    # Interior coverages classify identically under both conventions.
    trk5 = {f: [obj(f, 5, B1)] for f in range(5)}
    for b in ("strict", "closed"):
        e = TrackingEvaluation(boundary=b)
        e.add_sequence(gt, trk5, num_frames=10)
        assert e.compute().pt == 1.0

    with pytest.raises(ValueError, match="boundary"):
        TrackingEvaluation(boundary="open")


def test_ids_persist_across_long_gap():
    """Devkit IDS semantics: the last matched tracker id persists across an
    arbitrarily long untracked gap — a re-match with the SAME id after the
    gap is NOT an ID switch; a different id IS (one IDS, charged at the
    re-match frame)."""
    gt = {f: [obj(f, 1, B1)] for f in range(10)}
    # Same id 5 before and after a 4-frame gap: no IDS, one FRAG.
    trk_same = {f: [obj(f, 5, B1)] for f in (0, 1, 2, 7, 8, 9)}
    ev = TrackingEvaluation()
    ev.add_sequence(gt, trk_same, num_frames=10)
    m = ev.compute()
    assert m.id_switches == 0 and m.fragments == 1

    # Different id after the gap: exactly one IDS (not one per gap frame).
    trk_diff = {f: [obj(f, 5 if f < 3 else 6, B1)]
                for f in (0, 1, 2, 7, 8, 9)}
    ev2 = TrackingEvaluation()
    ev2.add_sequence(gt, trk_diff, num_frames=10)
    m2 = ev2.compute()
    assert m2.id_switches == 1 and m2.fragments == 1


def test_frag_counts_each_interruption():
    """FRAG: every tracked->untracked transition with later coverage counts;
    a trailing untracked stretch does not."""
    gt = {f: [obj(f, 1, B1)] for f in range(10)}
    # Tracked 0-1, gap 2, tracked 3-4, gap 5, tracked 6, untracked 7-9.
    trk = {f: [obj(f, 5, B1)] for f in (0, 1, 3, 4, 6)}
    ev = TrackingEvaluation()
    ev.add_sequence(gt, trk, num_frames=10)
    m = ev.compute()
    assert m.fragments == 2        # interruptions at 2 and 5; 7-9 trails
    assert m.id_switches == 0


def test_cyclist_class_scoring():
    """track_class Cyclist scores like any class (no special ignore set)."""
    gt = {f: [obj(f, 1, B1, typ="Cyclist")] for f in range(5)}
    ev = TrackingEvaluation(cls="cyclist")
    ev.add_sequence(gt, gt, num_frames=5)
    m = ev.compute()
    assert m.mota == 1.0 and m.mt == 1.0
