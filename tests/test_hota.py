"""HOTA metrics: hand-crafted scenarios with analytically-known answers.

The expected values are derived from the TrackEval algorithm definitions
(trackeval/metrics/hota.py) — e.g. the classic two-track identity-swap toy
gives AssA = 1/3 at every alpha, and a half-miss track gives
DetA = AssA = 1/2 so HOTA = 1/2.
"""

import numpy as np
import pytest

from mmmot_tpu.data.kitti_io import KittiObject
from mmmot_tpu.eval import HotaEvaluation, evaluate_hota
from mmmot_tpu.eval.hota import ALPHAS

B1 = [100, 100, 200, 200]
B2 = [300, 100, 400, 200]


def obj(frame, tid, box, typ="Car", trunc=0.0):
    return KittiObject(frame=frame, track_id=tid, obj_type=typ,
                       truncated=trunc, bbox=np.array(box, float))


def shifted(box, dx):
    return [box[0] + dx, box[1], box[2] + dx, box[3]]


def test_perfect_tracking():
    gt = {f: [obj(f, 1, B1), obj(f, 2, B2)] for f in range(6)}
    ev = HotaEvaluation()
    ev.add_sequence(gt, gt, num_frames=6)
    m = ev.compute()
    assert m.hota == pytest.approx(1.0)
    assert m.deta == pytest.approx(1.0)
    assert m.assa == pytest.approx(1.0)
    assert m.loca == pytest.approx(1.0)
    assert np.allclose(m.hota_alpha, 1.0)


def test_identity_swap_assa_one_third():
    # Two GT tracks over 2K frames; predictions swap ids at half-time.
    # Perfect detection (DetA = 1); each (gt, pred) TP pair overlaps for
    # K of the union 2K + K... TPA=K, FNA=K, FPA=K -> A = 1/3 for every
    # TP, so AssA = 1/3 and HOTA = sqrt(1/3) at every alpha.
    K = 4
    gt, trk = {}, {}
    for f in range(2 * K):
        gt[f] = [obj(f, 1, B1), obj(f, 2, B2)]
        a, b = (7, 8) if f < K else (8, 7)
        trk[f] = [obj(f, a, B1), obj(f, b, B2)]
    ev = HotaEvaluation()
    ev.add_sequence(gt, trk, num_frames=2 * K)
    m = ev.compute()
    assert m.deta == pytest.approx(1.0)
    assert m.assa == pytest.approx(1 / 3)
    assert m.hota == pytest.approx(np.sqrt(1 / 3))


def test_half_missed_track():
    # One GT track of 2K frames, tracked on alternate frames, no FPs:
    # TP = K, FN = K -> DetA = 1/2; the single pair has TPA=K, FNA=K,
    # FPA=0 -> AssA = 1/2; HOTA = 1/2.
    K = 4
    gt = {f: [obj(f, 1, B1)] for f in range(2 * K)}
    trk = {f: [obj(f, 9, B1)] for f in range(0, 2 * K, 2)}
    ev = HotaEvaluation()
    ev.add_sequence(gt, trk, num_frames=2 * K)
    m = ev.compute()
    assert m.deta == pytest.approx(0.5)
    assert m.detre == pytest.approx(0.5)
    assert m.detpr == pytest.approx(1.0)
    assert m.assa == pytest.approx(0.5)
    assert m.hota == pytest.approx(0.5)


def test_localisation_threshold_curve():
    # Boxes offset so IoU is ~0.6: TPs exist only for alphas <= that IoU,
    # so the per-alpha HOTA curve steps to zero past it and the mean
    # reflects the fraction of alphas below.
    dx = 25  # IoU = 75/125 = 0.6 for a 100-wide box
    gt = {f: [obj(f, 1, B1)] for f in range(5)}
    trk = {f: [obj(f, 9, shifted(B1, dx))] for f in range(5)}
    ev = HotaEvaluation()
    ev.add_sequence(gt, trk, num_frames=5)
    m = ev.compute()
    iou = 75.0 / 125.0
    good = ALPHAS <= iou + 1e-9
    assert np.allclose(m.hota_alpha[good], 1.0)
    assert np.allclose(m.hota_alpha[~good], 0.0)
    assert m.hota == pytest.approx(good.mean())
    # TrackEval convention: alphas with zero TPs contribute LocA = 1.0.
    assert m.loca == pytest.approx((iou * good.sum() + (~good).sum())
                                   / len(ALPHAS))


def test_van_removed_for_car():
    # A tracker box sitting on a Van: removed in preprocessing -> no FP,
    # and with no valid GT at all the metrics stay zero (not negative).
    gt = {0: [obj(0, 1, B1, "Van")]}
    trk = {0: [obj(0, 5, B1)]}
    ev = HotaEvaluation(cls="car")
    ev.add_sequence(gt, trk, num_frames=1)
    m = ev.compute()
    assert m.hota == 0.0 and m.deta == 0.0


def test_van_does_not_steal_valid_match():
    # A valid Car and an overlapping-but-farther Van: the tracker box on
    # the Car must match the Car (TP), not be absorbed by the Van.
    gt = {f: [obj(f, 1, B1), obj(f, 2, shifted(B1, 60), "Van")]
          for f in range(3)}
    trk = {f: [obj(f, 5, B1)] for f in range(3)}
    ev = HotaEvaluation(cls="car")
    ev.add_sequence(gt, trk, num_frames=3)
    m = ev.compute()
    assert m.hota == pytest.approx(1.0)


def test_dontcare_absorbs_fp():
    dc = obj(0, -1, [95, 95, 205, 205], "DontCare")
    gt = {0: [dc]}
    trk = {0: [obj(0, 5, B1)]}
    ev = HotaEvaluation(cls="car")
    ev.add_sequence(gt, trk, num_frames=1)
    m = ev.compute()
    assert m.deta == 0.0  # absorbed: no FP, no GT -> all-zero, not penalised
    # Control: without the DontCare region the box is a pure FP.
    ev2 = HotaEvaluation(cls="car")
    ev2.add_sequence({}, trk, num_frames=1)
    m2 = ev2.compute()
    assert m2.detpr == 0.0


def test_multi_sequence_combination():
    # Sequence A perfect, sequence B empty predictions: combined DetA is
    # TP/(TP+FN) pooled over both, AssA pooled TP-weighted (only A has
    # TPs, each with perfect association).
    K = 5
    gt = {f: [obj(f, 1, B1)] for f in range(K)}
    ev = HotaEvaluation()
    ev.add_sequence(gt, gt, num_frames=K)
    ev.add_sequence(gt, {}, num_frames=K)
    m = ev.compute()
    assert m.deta == pytest.approx(0.5)
    assert m.assa == pytest.approx(1.0)
    assert m.hota == pytest.approx(np.sqrt(0.5))


def test_evaluate_hota_files(tmp_path):
    from mmmot_tpu.data.kitti_io import write_kitti_result

    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res"
    gt_dir.mkdir(), res_dir.mkdir()
    objs = [obj(f, 1, B1) for f in range(4)]
    write_kitti_result(objs, str(gt_dir / "0000.txt"))
    write_kitti_result(objs, str(res_dir / "0000.txt"))
    m = evaluate_hota(str(gt_dir), str(res_dir), ["0000"],
                      summary_dir=str(tmp_path))
    assert m.hota == pytest.approx(1.0)
    text = (tmp_path / "hota_car.txt").read_text()
    assert "HOTA" in text and "1.000000" in text
