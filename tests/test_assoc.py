"""Association-layer parity tests (SURVEY.md §7 hard part #1).

Ground truth is the reference-shaped ILP solved exactly with scipy.milp.
The chain of evidence:

1. LAP-reduction oracle == ILP oracle  -> the square reduction is exact.
2. in-graph auction == ILP oracle      -> the jittable solver is exact.
3. Sinkhorn ~= ILP oracle              -> the fast solver is near-exact.
4. Decisions are always structurally valid (partition constraints).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.assoc import (solve_auction, solve_greedy, solve_ilp_oracle,
                             solve_lap_oracle, solve_sinkhorn)
from mmmot_tpu.assoc.cost import decisions_objective

N = 10
TRIALS = 12

_j_auction = jax.jit(solve_auction)
_j_sink = jax.jit(lambda *a: solve_sinkhorn(*a, tau=0.02, iters=200))
_j_greedy = jax.jit(solve_greedy)
_j_obj = jax.jit(decisions_objective)


def instances(rng):
    for _ in range(TRIALS):
        link = rng.normal(0, 1, (N, N)).astype(np.float32)
        new = rng.normal(0, 1, N).astype(np.float32)
        end = rng.normal(0, 1, N).astype(np.float32)
        mp = np.arange(N) < rng.integers(0, N + 1)
        mc = np.arange(N) < rng.integers(0, N + 1)
        yield (link, new, end, mp, mc)


def _obj(dec, inst):
    return float(_j_obj(dec, *[jnp.asarray(x) for x in inst]))


def check_valid(dec, mp, mc):
    """Every valid prev det either links or ends; curr links xor is new."""
    mprev = np.asarray(dec.match_prev)
    mcurr = np.asarray(dec.match_curr)
    is_end = np.asarray(dec.is_end)
    is_new = np.asarray(dec.is_new)
    for i in range(N):
        if mp[i]:
            assert (mprev[i] >= 0) != is_end[i]
            if mprev[i] >= 0:
                assert mc[mprev[i]]
                assert mcurr[mprev[i]] == i
        else:
            assert mprev[i] == -1 and not is_end[i]
    for j in range(N):
        if mc[j]:
            assert (mcurr[j] >= 0) != is_new[j]
        else:
            assert mcurr[j] == -1 and not is_new[j]
    # No two prev link to the same curr.
    linked = mprev[(mprev >= 0) & mp]
    assert len(set(linked.tolist())) == len(linked)


def test_reduction_exact(rng):
    for inst in instances(rng):
        o_ilp = _obj(solve_ilp_oracle(*inst), inst)
        o_lap = _obj(solve_lap_oracle(*inst), inst)
        assert o_lap == pytest.approx(o_ilp, abs=1e-4)


def test_auction_exact(rng):
    for inst in instances(rng):
        ji = [jnp.asarray(x) for x in inst]
        o_ilp = _obj(solve_ilp_oracle(*inst), inst)
        dec = _j_auction(*ji)
        check_valid(dec, inst[3], inst[4])
        assert _obj(dec, inst) == pytest.approx(o_ilp, abs=1e-3)


def test_sinkhorn_near_exact(rng):
    gaps = []
    for inst in instances(rng):
        ji = [jnp.asarray(x) for x in inst]
        o_ilp = _obj(solve_ilp_oracle(*inst), inst)
        dec = _j_sink(*ji)
        check_valid(dec, inst[3], inst[4])
        gaps.append(o_ilp - _obj(dec, inst))
    # Never better than exact; close on average even on pure-noise scores.
    assert min(gaps) > -1e-3
    assert np.mean(gaps) < 0.25


def test_greedy_valid(rng):
    for inst in instances(rng):
        ji = [jnp.asarray(x) for x in inst]
        dec = _j_greedy(*ji)
        check_valid(dec, inst[3], inst[4])
        o_ilp = _obj(solve_ilp_oracle(*inst), inst)
        assert _obj(dec, inst) <= o_ilp + 1e-3


def test_batched_auction(rng):
    """Leading batch axes work and agree with per-instance solves."""
    insts = list(instances(rng))[:4]
    link = jnp.stack([jnp.asarray(i[0]) for i in insts])
    new = jnp.stack([jnp.asarray(i[1]) for i in insts])
    end = jnp.stack([jnp.asarray(i[2]) for i in insts])
    mp = jnp.stack([jnp.asarray(i[3]) for i in insts])
    mc = jnp.stack([jnp.asarray(i[4]) for i in insts])
    batched = jax.jit(solve_auction)(link, new, end, mp, mc)
    for b, inst in enumerate(insts):
        single = _j_auction(*[jnp.asarray(x) for x in inst])
        assert _obj(jax.tree.map(lambda x: x[b], batched), inst) == \
            pytest.approx(_obj(single, inst), abs=1e-3)


def det_instances(rng, trials=TRIALS):
    """Instances with per-detection confidence scores (log-odds-like)."""
    for _ in range(trials):
        link = rng.normal(0, 1, (N, N)).astype(np.float32)
        new = rng.uniform(0, 1, N).astype(np.float32)
        end = rng.uniform(0, 1, N).astype(np.float32)
        det_p = rng.normal(0, 1.5, N).astype(np.float32)
        det_c = rng.normal(0, 1.5, N).astype(np.float32)
        mp = np.arange(N) < rng.integers(0, N + 1)
        mc = np.arange(N) < rng.integers(0, N + 1)
        yield (link, new, end, mp, mc, det_p, det_c)


def _obj_det(dec, inst):
    link, new, end, mp, mc, dp, dc = [jnp.asarray(x) for x in inst]
    return float(decisions_objective(dec, link, new, end, mp, mc,
                                     det_prev=dp, det_curr=dc))


def check_valid_det(dec, mp, mc):
    """With y_det: accepted prev links xor ends; rejected does neither."""
    mprev = np.asarray(dec.match_prev)
    mcurr = np.asarray(dec.match_curr)
    is_end = np.asarray(dec.is_end)
    is_new = np.asarray(dec.is_new)
    kp = np.asarray(dec.keep_prev)
    kc = np.asarray(dec.keep_curr)
    for i in range(N):
        if not mp[i]:
            assert mprev[i] == -1 and not is_end[i] and not kp[i]
        elif kp[i]:
            assert (mprev[i] >= 0) != is_end[i]
            if mprev[i] >= 0:
                assert mc[mprev[i]] and kc[mprev[i]]
                assert mcurr[mprev[i]] == i
        else:
            assert mprev[i] == -1 and not is_end[i]
    for j in range(N):
        if not mc[j]:
            assert mcurr[j] == -1 and not is_new[j] and not kc[j]
        elif kc[j]:
            assert (mcurr[j] >= 0) != is_new[j]
        else:
            assert mcurr[j] == -1 and not is_new[j]


def test_det_reduction_exact(rng):
    """LAP folding of the y_det ILP == explicit y_det MILP (objective)."""
    for inst in det_instances(rng):
        link, new, end, mp, mc, dp, dc = inst
        o_ilp = _obj_det(solve_ilp_oracle(link, new, end, mp, mc,
                                          det_prev=dp, det_curr=dc), inst)
        dec = solve_lap_oracle(link, new, end, mp, mc,
                               det_prev=dp, det_curr=dc)
        check_valid_det(dec, mp, mc)
        assert _obj_det(dec, inst) == pytest.approx(o_ilp, abs=1e-4)


def test_det_auction_exact(rng):
    """In-graph auction matches the y_det MILP oracle."""
    solve = jax.jit(lambda *a, **k: solve_auction(*a, **k))
    for inst in det_instances(rng):
        link, new, end, mp, mc, dp, dc = inst
        o_ilp = _obj_det(solve_ilp_oracle(link, new, end, mp, mc,
                                          det_prev=dp, det_curr=dc), inst)
        dec = solve(*[jnp.asarray(x) for x in inst[:5]],
                    det_prev=jnp.asarray(dp), det_curr=jnp.asarray(dc))
        check_valid_det(dec, mp, mc)
        assert _obj_det(dec, inst) == pytest.approx(o_ilp, abs=1e-3)


def test_det_rejection_happens(rng):
    """A strongly negative det score forces rejection."""
    full = np.ones(N, bool)
    link = np.full((N, N), 0.1, np.float32)
    new = np.full(N, 0.5, np.float32)
    end = np.full(N, 0.5, np.float32)
    det_c = np.full(N, 0.8, np.float32)
    det_c[3] = -10.0                      # obvious false positive
    det_p = np.full(N, 0.8, np.float32)
    dec = solve_auction(*[jnp.asarray(x) for x in
                          (link, new, end, full, full)],
                        det_prev=jnp.asarray(det_p),
                        det_curr=jnp.asarray(det_c))
    assert not bool(dec.keep_curr[3])
    assert not bool(dec.is_new[3]) and int(dec.match_curr[3]) == -1
    # Everyone else is accepted.
    assert int(jnp.sum(dec.keep_curr)) == N - 1


def test_without_det_scores_keep_equals_mask(rng):
    for inst in instances(rng):
        dec = _j_auction(*[jnp.asarray(x) for x in inst])
        np.testing.assert_array_equal(np.asarray(dec.keep_prev), inst[3])
        np.testing.assert_array_equal(np.asarray(dec.keep_curr), inst[4])


def test_link_threshold_forbids_weak_links(rng):
    """associate() with link_threshold rejects sub-threshold links."""
    from mmmot_tpu.assoc import associate
    from mmmot_tpu.config import AssocConfig

    full = jnp.ones(N, bool)
    # All links weak (0.3) but still cheaper than end+new (0.1 + 0.1 = 0.2
    # per pair < 0.3): without a threshold everything links.
    link = jnp.full((N, N), 0.01) + 0.29 * jnp.eye(N)
    new = jnp.full(N, 0.1)
    end = jnp.full(N, 0.1)
    dec = associate(link, new, end, full, full, AssocConfig())
    assert bool(jnp.all(dec.match_prev >= 0))
    dec = associate(link, new, end, full, full,
                    AssocConfig(link_threshold=0.5))
    assert not bool(jnp.any(dec.match_prev >= 0))
    assert bool(jnp.all(dec.is_end)) and bool(jnp.all(dec.is_new))


def test_empty_frames():
    z = jnp.zeros((N, N)); zn = jnp.zeros(N)
    none = jnp.zeros(N, bool)
    full = jnp.ones(N, bool)
    # no prev, all curr -> all new
    dec = _j_auction(z, zn + 0.5, zn, none, full)
    assert bool(jnp.all(dec.is_new))
    assert bool(jnp.all(dec.match_curr == -1))
    # all prev, no curr -> all end
    dec = _j_auction(z, zn, zn + 0.5, full, none)
    assert bool(jnp.all(dec.is_end))
    # nothing at all
    dec = _j_auction(z, zn, zn, none, none)
    assert not bool(jnp.any(dec.is_new | dec.is_end))
