"""Tracker runtime: ID bookkeeping, scan streaming, empty frames."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.assoc import associate
from mmmot_tpu.config import AssocConfig
from mmmot_tpu.tracker.tracker import TrackerState, assign_ids

N = 5


@pytest.fixture(scope="module")
def run_fn():
    @jax.jit
    def run(state, link, new, end, mask_curr):
        dec = associate(link, new, end, state.mask, mask_curr,
                        AssocConfig(solver="auction"))
        ids_curr, next_id = assign_ids(state, dec, mask_curr)
        return dec, ids_curr, next_id

    return run


def _state(mask, ids, next_id):
    return TrackerState(feats={}, mask=jnp.asarray(mask),
                        ids=jnp.asarray(ids, jnp.int32),
                        ages=jnp.zeros(N, jnp.int32),
                        next_id=jnp.int32(next_id))


def test_id_inheritance(run_fn):
    state = _state([True] * 3 + [False] * 2, [10, 11, 12, -1, -1], 13)
    link = jnp.full((N, N), -5.0).at[2, 0].set(5.0).at[0, 1].set(5.0)
    new = jnp.full((N,), 0.5)
    end = jnp.full((N,), 0.5)
    mask_curr = jnp.array([True] * 4 + [False])
    dec, ids_curr, next_id = run_fn(state, link, new, end, mask_curr)
    np.testing.assert_array_equal(np.asarray(dec.match_curr),
                                  [2, 0, -1, -1, -1])
    np.testing.assert_array_equal(np.asarray(ids_curr), [12, 10, 13, 14, -1])
    assert int(next_id) == 15
    assert bool(dec.is_end[1])


def test_first_frame_all_new(run_fn):
    state = _state([False] * N, [-1] * N, 0)
    link = jnp.zeros((N, N))
    mask_curr = jnp.array([True, True, True, False, False])
    dec, ids_curr, next_id = run_fn(state, link, jnp.full((N,), 0.5),
                                    jnp.full((N,), 0.5), mask_curr)
    np.testing.assert_array_equal(np.asarray(ids_curr), [0, 1, 2, -1, -1])
    assert int(next_id) == 3


def test_empty_current_frame(run_fn):
    state = _state([True] * 2 + [False] * 3, [7, 8, -1, -1, -1], 9)
    dec, ids_curr, next_id = run_fn(state, jnp.zeros((N, N)),
                                    jnp.full((N,), 0.5),
                                    jnp.full((N,), 0.5),
                                    jnp.zeros(N, bool))
    assert (np.asarray(ids_curr) == -1).all()
    assert bool(dec.is_end[0]) and bool(dec.is_end[1])
    assert int(next_id) == 9


def test_sequence_scan_consistency():
    """Scan tracker over controlled features: persistent objects keep IDs.

    Uses a stub 'net' via direct state manipulation — link scores derive
    from feature dot products, so identical features across frames chain.
    """
    from mmmot_tpu.config import (AffinityConfig, AppearanceConfig,
                                  FusionConfig, ModelConfig, NewEndConfig,
                                  PointConfig)
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = ModelConfig(
        appearance=AppearanceConfig(depth=11, crop_size=(32, 32),
                                    reduction_dim=16, out_dim=32,
                                    width_mult=0.0625),
        point=PointConfig(point_len=8, channels=(16, 32), out_dim=32),
        fusion=FusionConfig(variant="C", out_dim=32),
        affinity=AffinityConfig(hidden_dim=16),
        new_end=NewEndConfig(hidden_dim=16),
    )
    net = model_entry(cfg)
    T, Ns, P = 4, 6, 8
    key = jax.random.PRNGKey(0)
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        key, batch)
    module = TrackingModule(net, vars_, AssocConfig(solver="auction"))
    crops = jnp.tile(jax.random.normal(key, (1, Ns, 32, 32, 3)), (T, 1, 1, 1, 1))
    points = jnp.tile(jax.random.normal(key, (1, Ns, P, 4)), (T, 1, 1, 1))
    det_mask = jnp.zeros((T, Ns), bool).at[:, :3].set(True)
    out = jax.jit(lambda c, p, pm, dm: track_sequence(
        module, c, p, pm, dm))(crops, points,
                               jnp.ones((T, Ns, P), bool), det_mask)
    ids = np.asarray(out["ids"])
    assert ids.shape == (T, Ns)
    # Valid slots have ids, padded slots are -1.
    assert (ids[:, 3:] == -1).all()
    assert (ids[:, :3] >= 0).all()

    # With LP det-confidence rejection enabled, the scan still runs and
    # padded slots stay -1 (rejected dets would also emit -1).
    module_det = TrackingModule(net, vars_, AssocConfig(
        solver="auction", use_det_scores=True))
    out2 = jax.jit(lambda c, p, pm, dm: track_sequence(
        module_det, c, p, pm, dm))(crops, points,
                                   jnp.ones((T, Ns, P), bool), det_mask)
    ids2 = np.asarray(out2["ids"])
    assert (ids2[:, 3:] == -1).all()


def test_compact_first_raw_frames_matches_uncompacted():
    """Compact-first pipeline == per-slot pipeline (same ids, 0 dropped)."""
    from mmmot_tpu.config import (AffinityConfig, AppearanceConfig,
                                  FusionConfig, ModelConfig, NewEndConfig,
                                  PointConfig)
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence_from_frames

    cfg = ModelConfig(
        appearance=AppearanceConfig(depth=11, crop_size=(32, 32),
                                    reduction_dim=16, out_dim=32,
                                    width_mult=0.0625),
        point=PointConfig(point_len=8, channels=(16, 32), out_dim=32),
        fusion=FusionConfig(variant="A", out_dim=32),
        affinity=AffinityConfig(hidden_dim=16),
        new_end=NewEndConfig(hidden_dim=16),
    )
    net = model_entry(cfg)
    T, Ns, P, H, W = 3, 4, 8, 48, 96
    key = jax.random.PRNGKey(1)
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        key, batch)
    module = TrackingModule(net, vars_, AssocConfig(solver="auction"))

    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.integers(0, 255, (T, H, W, 3)), jnp.uint8)
    clouds = np.zeros((T, 64, 4), np.float32)
    clouds[..., 0] = rng.uniform(-10, 10, (T, 64))
    clouds[..., 1] = rng.uniform(-2, 2, (T, 64))
    clouds[..., 2] = rng.uniform(2, 30, (T, 64))
    clouds = jnp.asarray(clouds)
    proj = jnp.asarray([[50.0, 0, W / 2, 0], [0, 50.0, H / 2, 0],
                        [0, 0, 1, 0]], jnp.float32)
    boxes = jnp.asarray(rng.uniform(5, 40, (T, Ns, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 20.0)
    det_mask = jnp.zeros((T, Ns), bool).at[:, :3].set(True)

    run = lambda cap, chunk: jax.jit(
        lambda im, cl, bx, dm: track_sequence_from_frames(
            module, im, cl, bx, dm, proj, (32, 32), P,
            compact_capacity=cap, extract_chunk=chunk, crop_window=64))(
        images, clouds, boxes, det_mask)

    plain = run(None, None)
    compact = run(12, 4)
    assert int(compact["n_dropped"]) == 0
    np.testing.assert_array_equal(np.asarray(plain["ids"]),
                                  np.asarray(compact["ids"]))

    # Under-sized capacity drops detections and reports the count.
    small = run(4, 4)
    assert int(small["n_dropped"]) == int(det_mask.sum()) - 4


def test_scan_with_dead_sensor():
    """track_sequence runs with a missing modality (sensor failure)."""
    from mmmot_tpu.config import (AffinityConfig, AppearanceConfig,
                                  FusionConfig, ModelConfig, NewEndConfig,
                                  PointConfig)
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = ModelConfig(
        appearance=AppearanceConfig(depth=11, crop_size=(32, 32),
                                    reduction_dim=16, out_dim=32,
                                    width_mult=0.0625),
        point=PointConfig(point_len=8, channels=(16, 32), out_dim=32),
        fusion=FusionConfig(variant="C", out_dim=32),
        affinity=AffinityConfig(hidden_dim=16),
        new_end=NewEndConfig(hidden_dim=16),
    )
    net = model_entry(cfg)
    T, Ns, P = 3, 4, 8
    key = jax.random.PRNGKey(2)
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        key, batch)
    module = TrackingModule(net, vars_, AssocConfig())
    crops = jax.random.normal(key, (T, Ns, 32, 32, 3))
    points = jax.random.normal(key, (T, Ns, P, 4))
    pm = jnp.ones((T, Ns, P), bool)
    dm = jnp.ones((T, Ns), bool)
    # Dead LiDAR and dead camera must both stream fine.
    out_img = jax.jit(lambda c: track_sequence(module, c, None, pm, dm))(
        crops)
    out_pts = jax.jit(lambda p: track_sequence(module, None, p, pm, dm))(
        points)
    assert (np.asarray(out_img["ids"])[0] >= 0).all()
    assert (np.asarray(out_pts["ids"])[0] >= 0).all()


def test_parallel_assoc_matches_sequential():
    """Batched association pre-solve == per-frame sequential scan."""
    from mmmot_tpu.config import (AffinityConfig, AppearanceConfig,
                                  FusionConfig, ModelConfig, NewEndConfig,
                                  PointConfig)
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = ModelConfig(
        appearance=AppearanceConfig(depth=11, crop_size=(32, 32),
                                    reduction_dim=16, out_dim=32,
                                    width_mult=0.0625),
        point=PointConfig(point_len=8, channels=(16, 32), out_dim=32),
        fusion=FusionConfig(variant="C", out_dim=32),
        affinity=AffinityConfig(hidden_dim=16),
        new_end=NewEndConfig(hidden_dim=16),
    )
    net = model_entry(cfg)
    T, Ns, P = 6, 5, 8
    key = jax.random.PRNGKey(3)
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        key, batch)

    rng = np.random.default_rng(11)
    crops = jnp.asarray(rng.normal(0, 1, (T, Ns, 32, 32, 3)).astype(
        np.float32))
    points = jnp.asarray(rng.normal(0, 1, (T, Ns, P, 4)).astype(np.float32))
    pm = jnp.ones((T, Ns, P), bool)
    dm = jnp.asarray(np.arange(Ns)[None, :]
                     < rng.integers(1, Ns + 1, (T, 1)))

    mods = {
        mode: TrackingModule(net, vars_, AssocConfig(),
                             parallel_assoc=(mode == "parallel"))
        for mode in ("parallel", "sequential")
    }
    outs = {mode: jax.jit(lambda c, p, q, d, m=m: track_sequence(
        m, c, p, q, d))(crops, points, pm, dm)
        for mode, m in mods.items()}
    np.testing.assert_array_equal(np.asarray(outs["parallel"]["ids"]),
                                  np.asarray(outs["sequential"]["ids"]))
    np.testing.assert_allclose(
        np.asarray(outs["parallel"]["det_score"]),
        np.asarray(outs["sequential"]["det_score"]), atol=1e-6)

    # use_det_scores forces sequential; requesting parallel raises.
    with pytest.raises(ValueError):
        TrackingModule(net, vars_, AssocConfig(use_det_scores=True),
                       parallel_assoc=True)

    # gnn_rounds > 0 stays SOUND with the parallel pre-solve (features
    # depend on the true det masks, never on decisions) — equality must
    # hold with message passing on too.
    import dataclasses as _dc

    cfg_g = _dc.replace(cfg, affinity=_dc.replace(cfg.affinity,
                                                  gnn_rounds=1))
    net_g = model_entry(cfg_g)
    vars_g = jax.jit(lambda r, b: net_g.init({"params": r}, b,
                                             train=False))(key, batch)
    outs_g = {mode: jax.jit(lambda c, p, q, d, m=m: track_sequence(
        m, c, p, q, d))(crops, points, pm, dm)
        for mode, m in ((mo, TrackingModule(
            net_g, vars_g, AssocConfig(),
            parallel_assoc=(mo == "parallel")))
            for mo in ("parallel", "sequential"))}
    np.testing.assert_array_equal(np.asarray(outs_g["parallel"]["ids"]),
                                  np.asarray(outs_g["sequential"]["ids"]))


def test_pallas_affinity_end_to_end_matches_xla():
    """Full sequence pipeline with the fused Pallas affinity kernel
    (interpret mode) produces the same track IDs as the XLA path, in both
    the parallel-presolve and sequential-scan strategies."""
    from mmmot_tpu.configs import tiny
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = tiny().model
    net = model_entry(cfg)
    T, Ns, P = 5, 8, 16
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)

    rng = np.random.default_rng(21)
    crops = jnp.asarray(rng.normal(0, 1, (T, Ns, 32, 32, 3)).astype(
        np.float32))
    points = jnp.asarray(rng.normal(0, 1, (T, Ns, P, 4)).astype(np.float32))
    pm = jnp.ones((T, Ns, P), bool)
    dm = jnp.asarray(np.arange(Ns)[None, :]
                     < rng.integers(1, Ns + 1, (T, 1)))

    outs = {}
    for name, kw in {
        "xla": dict(use_pallas_affinity=False),
        "pallas_par": dict(use_pallas_affinity=True, pallas_interpret=True),
        "pallas_seq": dict(use_pallas_affinity=True, pallas_interpret=True,
                           parallel_assoc=False),
    }.items():
        m = TrackingModule(net, vars_, AssocConfig(), **kw)
        outs[name] = jax.jit(lambda c, p, q, d, m=m: track_sequence(
            m, c, p, q, d))(crops, points, pm, dm)
    for name in ("pallas_par", "pallas_seq"):
        np.testing.assert_array_equal(np.asarray(outs[name]["ids"]),
                                      np.asarray(outs["xla"]["ids"]),
                                      err_msg=name)


def test_hybrid_presolve_matches_sequential_ydet():
    """y_det mode (LP detection rejection): the hybrid pre-solve — batched
    correlation matmuls + mask-dependent scan — must produce EXACTLY the
    decisions of the fully sequential step_from_feats scan, including on
    sequences where rejections actually shrink the carried mask."""
    from mmmot_tpu.configs import tiny
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = tiny().model
    net = model_entry(cfg)
    T, Ns, P = 6, 8, 16
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)

    rng = np.random.default_rng(31)
    crops = jnp.asarray(rng.normal(0, 1, (T, Ns, 32, 32, 3)).astype(
        np.float32))
    points = jnp.asarray(rng.normal(0, 1, (T, Ns, P, 4)).astype(np.float32))
    pm = jnp.ones((T, Ns, P), bool)
    dm = jnp.asarray(np.arange(Ns)[None, :]
                     < rng.integers(2, Ns + 1, (T, 1)))

    # Test contrivance: an untrained det head emits uniformly POSITIVE
    # logits (~0.5-1.2), so a negative weight is the only way to get a
    # MIX of LP accepts and rejects — which is exactly the regime where
    # the carried mask actually shrinks and the hybrid could diverge.
    for raw in (False, True):
        acfg = AssocConfig(solver="auction", use_det_scores=True,
                           det_score_weight=-1.0, raw_new_end=raw)
        outs = {}
        for name, hybrid in (("hybrid", True), ("sequential", False)):
            m = TrackingModule(net, vars_, acfg, hybrid_presolve=hybrid)
            assert not m.parallel_assoc
            outs[name] = jax.jit(lambda c, p, q, d, m=m: track_sequence(
                m, c, p, q, d))(crops, points, pm, dm)
        np.testing.assert_array_equal(np.asarray(outs["hybrid"]["ids"]),
                                      np.asarray(outs["sequential"]["ids"]),
                                      err_msg=f"raw_new_end={raw}")
        np.testing.assert_allclose(
            np.asarray(outs["hybrid"]["det_score"]),
            np.asarray(outs["sequential"]["det_score"]), atol=1e-6)
        # The regime is non-trivial: at least one detection must actually
        # be rejected somewhere (ids == -1 at a valid slot).
        ids = np.asarray(outs["sequential"]["ids"])
        assert ((ids < 0) & np.asarray(dm)).any(), \
            "no rejection happened; raise det_score_weight"


def test_revival_hybrid_matches_sequential():
    """Ghost-pool hybrid pre-solve (sequence.py::_revival_track): banded
    link precompute + provenance scan must produce EXACTLY the ids of the
    fully sequential step_from_feats scan, across revival windows, y_det
    rejection, and the spatial gate — including sequences whose dropout
    gaps actually create/revive/expire ghosts."""
    import dataclasses

    from mmmot_tpu.configs import tiny
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = tiny().model
    net = model_entry(cfg)
    T, Ns, P = 8, 6, 16
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)

    rng = np.random.default_rng(41)
    # Per-slot persistent signatures so re-appearing detections actually
    # match their ghost, plus noise so distinct slots stay distinct.
    sig_c = rng.normal(0, 1, (Ns, 32, 32, 3))
    sig_p = rng.normal(0, 1, (Ns, P, 4))
    crops = jnp.asarray((sig_c[None] + rng.normal(0, 0.05,
                                                  (T, Ns, 32, 32, 3))
                         ).astype(np.float32))
    points = jnp.asarray((sig_p[None] + rng.normal(0, 0.05, (T, Ns, P, 4))
                          ).astype(np.float32))
    pm = jnp.ones((T, Ns, P), bool)
    dm_np = rng.random((T, Ns)) < 0.8
    dm_np[:, 0] = True
    dm_np[2:4, 0] = False          # 2-frame gap -> ghost + revival at K=2
    dm_np[1:3, 1] = False          # another gap, different phase
    dm = jnp.asarray(dm_np)
    boxes = jnp.asarray(rng.uniform(0, 80, (T, Ns, 2)).repeat(2, axis=-1)
                        + np.asarray([0.0, 0.0, 20.0, 20.0],
                                     np.float32)[None, None])

    variants = [
        AssocConfig(solver="auction", revival_window=1),
        AssocConfig(solver="auction", revival_window=2),
        AssocConfig(solver="auction", revival_window=2,
                    use_det_scores=True, det_score_weight=-1.0,
                    raw_new_end=True),
        AssocConfig(solver="auction", revival_window=2, iou_weight=0.5,
                    iou_gate=0.01),
        AssocConfig(solver="auction", revival_window=2,
                    ghost_coverage=True),
        AssocConfig(solver="auction", revival_window=2,
                    use_det_scores=True, det_score_weight=-1.0,
                    raw_new_end=True, iou_weight=0.5, iou_gate=0.01,
                    ghost_coverage=True),
        # Coverage operating-point knobs: emission caps/gates must stay
        # bit-equal between the hybrid and sequential paths too.
        AssocConfig(solver="auction", revival_window=2,
                    use_det_scores=True, det_score_weight=-1.0,
                    raw_new_end=True, ghost_coverage=True,
                    coverage_max_miss=1),
        AssocConfig(solver="auction", revival_window=2,
                    ghost_coverage=True, coverage_min_score=0.5),
        AssocConfig(solver="auction", revival_window=2, iou_weight=0.5,
                    iou_gate=0.01, ghost_coverage=True, gate_predict=True),
    ]
    for acfg in variants:
        outs = {}
        for name, hybrid in (("hybrid", None), ("sequential", False)):
            m = TrackingModule(net, vars_, acfg, hybrid_presolve=hybrid)
            if name == "hybrid":
                assert m.hybrid_presolve, "auto must pick the hybrid path"
            outs[name] = jax.jit(
                lambda c, p, q, d, b, m=m: track_sequence(
                    m, c, p, q, d, boxes=b))(crops, points, pm, dm, boxes)
        np.testing.assert_array_equal(
            np.asarray(outs["hybrid"]["ids"]),
            np.asarray(outs["sequential"]["ids"]), err_msg=str(acfg))
        np.testing.assert_allclose(
            np.asarray(outs["hybrid"]["det_score"]),
            np.asarray(outs["sequential"]["det_score"]), atol=1e-6,
            err_msg=str(acfg))
        if acfg.ghost_coverage:
            np.testing.assert_array_equal(
                np.asarray(outs["hybrid"]["ghost_ids"]),
                np.asarray(outs["sequential"]["ghost_ids"]),
                err_msg=str(acfg))
            np.testing.assert_allclose(
                np.asarray(outs["hybrid"]["ghost_boxes"]),
                np.asarray(outs["sequential"]["ghost_boxes"]), atol=1e-4,
                err_msg=str(acfg))
            np.testing.assert_allclose(
                np.asarray(outs["hybrid"]["ghost_scores"]),
                np.asarray(outs["sequential"]["ghost_scores"]), atol=1e-6,
                err_msg=str(acfg))
    # The regime is non-trivial: a clean identical-signature dropout (the
    # construction test_revival_window_recovers_id_after_gap proves against
    # the sequential path) must revive THROUGH THE HYBRID PATH too.
    sig = jax.random.normal(jax.random.PRNGKey(5), (32, 32, 3))
    sigp = jax.random.normal(jax.random.PRNGKey(5), (P, 4))
    crops1 = jnp.tile(sig[None, None], (T, Ns, 1, 1, 1))
    points1 = jnp.tile(sigp[None, None], (T, Ns, 1, 1))
    dm1 = jnp.zeros((T, Ns), bool).at[:, 0].set(
        jnp.asarray([1, 1, 0, 0, 1, 1, 1, 1], bool))
    m = TrackingModule(net, vars_, AssocConfig(solver="auction",
                                               revival_window=2))
    assert m.hybrid_presolve
    ids = np.asarray(jax.jit(lambda c, p, q, d: track_sequence(
        m, c, p, q, d))(crops1, points1, pm, dm1)["ids"])
    assert ids[1, 0] == ids[4, 0], "hybrid path must revive across the gap"


def test_ghost_coverage_emits_extrapolated_boxes():
    """assoc.ghost_coverage: while a track is inside the revival window,
    the tracker emits its constant-velocity extrapolated box under the
    SAME track id — the FRAG/FN mitigation.  With a linearly moving box
    and a 2-frame dropout the emitted coverage boxes must be exactly the
    true extrapolation."""
    from mmmot_tpu.configs import tiny
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = tiny().model
    net = model_entry(cfg)
    T, Ns, P = 7, 4, 16
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)

    sig = jax.random.normal(jax.random.PRNGKey(5), (32, 32, 3))
    sigp = jax.random.normal(jax.random.PRNGKey(5), (P, 4))
    crops = jnp.tile(sig[None, None], (T, Ns, 1, 1, 1))
    points = jnp.tile(sigp[None, None], (T, Ns, 1, 1))
    pm = jnp.ones((T, Ns, P), bool)
    present = jnp.asarray([1, 1, 0, 0, 1, 1, 1], bool)
    dm = jnp.zeros((T, Ns), bool).at[:, 0].set(present)
    # Box moves +3 px/frame in x, +1 px/frame in y.
    boxes = np.zeros((T, Ns, 4), np.float32)
    for t in range(T):
        boxes[t, 0] = [10 + 3 * t, 20 + t, 40 + 3 * t, 50 + t]
    boxes = jnp.asarray(boxes)

    acfg = AssocConfig(solver="auction", revival_window=2,
                       ghost_coverage=True)
    m = TrackingModule(net, vars_, acfg)
    out = jax.jit(lambda c, p, q, d, b: track_sequence(
        m, c, p, q, d, boxes=b))(crops, points, pm, dm, boxes)
    ids = np.asarray(out["ids"])
    gids = np.asarray(out["ghost_ids"])
    gboxes = np.asarray(out["ghost_boxes"])
    assert gids.shape == (T, Ns) and gboxes.shape == (T, Ns, 4)
    tid = ids[1, 0]
    assert ids[4, 0] == tid, "revival must hold with coverage on"
    # Frames 2 and 3: the track is missing; its ghost must emit the true
    # constant-velocity extrapolation under the same id.
    for t, missed in ((2, 1), (3, 2)):
        row = np.where(gids[t] == tid)[0]
        assert row.size == 1, f"frame {t}: ghost for track {tid} missing"
        expect = np.asarray(boxes[1, 0]) + missed * np.asarray(
            [3.0, 1.0, 3.0, 1.0])
        np.testing.assert_allclose(gboxes[t, row[0]], expect, atol=1e-3)
    # Frames where the track is present emit no ghost for it.
    for t in (0, 1, 4, 5, 6):
        assert (gids[t] != tid).all()


def test_coverage_knobs_gate_emission():
    """assoc.coverage_max_miss / coverage_min_score: the operating-point
    knobs cap WHICH ghost frames emit coverage boxes without touching the
    revival itself — a ghost past the emission cap (or below the
    confidence bar) stays revivable, it just stops emitting rows.  The
    emitted scores must equal the track's LAST live det-head confidence."""
    import dataclasses

    from mmmot_tpu.configs import tiny
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = tiny().model
    net = model_entry(cfg)
    T, Ns, P = 7, 4, 16
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)

    sig = jax.random.normal(jax.random.PRNGKey(5), (32, 32, 3))
    sigp = jax.random.normal(jax.random.PRNGKey(5), (P, 4))
    crops = jnp.tile(sig[None, None], (T, Ns, 1, 1, 1))
    points = jnp.tile(sigp[None, None], (T, Ns, 1, 1))
    pm = jnp.ones((T, Ns, P), bool)
    present = jnp.asarray([1, 1, 0, 0, 1, 1, 1], bool)
    dm = jnp.zeros((T, Ns), bool).at[:, 0].set(present)
    boxes = np.zeros((T, Ns, 4), np.float32)
    for t in range(T):
        boxes[t, 0] = [10 + 3 * t, 20 + t, 40 + 3 * t, 50 + t]
    boxes = jnp.asarray(boxes)

    def run(acfg):
        m = TrackingModule(net, vars_, acfg)
        return jax.jit(lambda c, p, q, d, b: track_sequence(
            m, c, p, q, d, boxes=b))(crops, points, pm, dm, boxes)

    base = AssocConfig(solver="auction", revival_window=2,
                       ghost_coverage=True)
    out0 = run(base)
    ids = np.asarray(out0["ids"])
    tid = ids[1, 0]
    last_sc = float(np.asarray(out0["det_score"])[1, 0])
    g0 = np.asarray(out0["ghost_ids"])
    gs0 = np.asarray(out0["ghost_scores"])
    # Uncapped: frames 2 (missed=1) and 3 (missed=2) both emit, scored by
    # the track's frame-1 (last live) det-head confidence.
    for t in (2, 3):
        row = np.where(g0[t] == tid)[0]
        assert row.size == 1
        np.testing.assert_allclose(gs0[t, row[0]], last_sc, atol=1e-5)

    # coverage_max_miss=1: only the first missed frame emits; the ghost
    # still revives at frame 4.
    out1 = run(dataclasses.replace(base, coverage_max_miss=1))
    g1 = np.asarray(out1["ghost_ids"])
    assert (g1[2] == tid).any(), "first missed frame must still emit"
    assert (g1[3] != tid).all(), "frame past coverage_max_miss must not"
    assert np.asarray(out1["ids"])[4, 0] == tid, \
        "revival must be unaffected by the emission cap"

    # coverage_min_score just above/below the track's confidence flips
    # emission without touching ids.
    hi = run(dataclasses.replace(base, coverage_min_score=min(
        last_sc + 0.01, 1.0)))
    lo = run(dataclasses.replace(base, coverage_min_score=max(
        last_sc - 0.01, 0.0)))
    assert (np.asarray(hi["ghost_ids"])[2:4] != tid).all(), \
        "confidence bar above the track's score must suppress emission"
    for t in (2, 3):
        assert (np.asarray(lo["ghost_ids"])[t] == tid).any()
    np.testing.assert_array_equal(np.asarray(hi["ids"]), ids)


def test_gate_predict_revives_fast_mover():
    """assoc.gate_predict: with a TIGHT IoU gate, a fast-moving track that
    drops out for 2 frames can only revive if the gate compares against
    its constant-velocity PREDICTED box — the frozen box has drifted out
    of overlap.  Frozen-box gating (gate_predict=False) must fail on the
    same scene, proving the prediction is what does the work."""
    import dataclasses

    from mmmot_tpu.configs import tiny
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = tiny().model
    net = model_entry(cfg)
    T, Ns, P = 7, 4, 16
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)

    sig = jax.random.normal(jax.random.PRNGKey(5), (32, 32, 3))
    sigp = jax.random.normal(jax.random.PRNGKey(5), (P, 4))
    crops = jnp.tile(sig[None, None], (T, Ns, 1, 1, 1))
    points = jnp.tile(sigp[None, None], (T, Ns, 1, 1))
    pm = jnp.ones((T, Ns, P), bool)
    present = jnp.asarray([1, 1, 0, 0, 1, 1, 1], bool)
    dm = jnp.zeros((T, Ns), bool).at[:, 0].set(present)
    # 12 px/frame with a 30-px-wide box: consecutive frames overlap at
    # IoU 0.43 (the live links pass the 0.2 gate), but across the 2-frame
    # gap the frozen box is 36 px behind — zero overlap with the
    # reappearance, so only the predicted box can gate the revival in.
    boxes = np.zeros((T, Ns, 4), np.float32)
    for t in range(T):
        boxes[t, 0] = [10 + 12 * t, 20, 40 + 12 * t, 50]
    boxes = jnp.asarray(boxes)

    def run(gate_predict):
        acfg = AssocConfig(solver="auction", revival_window=3,
                           iou_gate=0.2, iou_weight=1.0,
                           ghost_coverage=True, gate_predict=gate_predict)
        m = TrackingModule(net, vars_, acfg)
        return np.asarray(jax.jit(
            lambda c, p, q, d, b: track_sequence(m, c, p, q, d, boxes=b))(
            crops, points, pm, dm, boxes)["ids"])

    ids_pred = run(True)
    assert ids_pred[4, 0] == ids_pred[1, 0], \
        "predicted gating must revive the fast mover across the gap"
    ids_frozen = run(False)
    assert ids_frozen[4, 0] != ids_frozen[1, 0], \
        "frozen-box gating must NOT revive it (IoU 0 vs the stale box) — " \
        "if it does, this scene no longer isolates the prediction"

    # Config guards: gate_predict without coverage / without a gate.
    with pytest.raises(ValueError, match="ghost_coverage"):
        AssocConfig(revival_window=2, iou_gate=0.2, gate_predict=True)
    with pytest.raises(ValueError, match="iou_gate"):
        AssocConfig(revival_window=2, ghost_coverage=True,
                    gate_predict=True)


def test_hybrid_presolve_gnn_guard():
    """gnn_rounds > 0 makes features mask-dependent: explicit
    hybrid_presolve=True must raise; auto must fall back to sequential."""
    import dataclasses

    import pytest

    from mmmot_tpu.configs import tiny
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule

    cfg = tiny().model
    cfg = dataclasses.replace(
        cfg, affinity=dataclasses.replace(cfg.affinity, gnn_rounds=1))
    net = model_entry(cfg)
    batch = {"crops": jnp.zeros((1, 2, 4, 32, 32, 3)),
             "points": jnp.zeros((1, 2, 4, 16, 4)),
             "point_mask": jnp.ones((1, 2, 4, 16), bool),
             "det_mask": jnp.ones((1, 2, 4), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)
    acfg = AssocConfig(solver="auction", use_det_scores=True)
    with pytest.raises(ValueError, match="gnn_rounds"):
        TrackingModule(net, vars_, acfg, hybrid_presolve=True)
    m = TrackingModule(net, vars_, acfg)
    assert not m.hybrid_presolve


def test_revival_window_recovers_id_after_gap():
    """revival_window K: a detection dropout of <= K frames no longer
    costs an ID switch — the track survives as a ghost and a later match
    revives its ID.  K=0 (the reference-faithful default) starts a fresh
    track; a gap longer than K expires the ghost."""
    from mmmot_tpu.configs import tiny
    import dataclasses

    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    cfg = tiny().model
    net = model_entry(cfg)
    T, Ns, P = 6, 4, 16
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)

    # One persistent object in slot 0, visible frames 0,1 and 4,5
    # (2-frame dropout at 2,3); identical signature before/after.
    key = jax.random.PRNGKey(5)
    sig_c = jax.random.normal(key, (32, 32, 3))
    sig_p = jax.random.normal(key, (P, 4))
    crops = jnp.tile(sig_c[None, None], (T, Ns, 1, 1, 1))
    points = jnp.tile(sig_p[None, None], (T, Ns, 1, 1))
    pm = jnp.ones((T, Ns, P), bool)
    present = jnp.asarray([1, 1, 0, 0, 1, 1], bool)
    dm = jnp.zeros((T, Ns), bool).at[:, 0].set(present)

    def run(k):
        acfg = AssocConfig(solver="auction", revival_window=k)
        m = TrackingModule(net, vars_, acfg)
        return np.asarray(jax.jit(
            lambda c, p, q, d: track_sequence(m, c, p, q, d))(
            crops, points, pm, dm)["ids"])

    ids0 = run(0)
    assert ids0[1, 0] != ids0[4, 0], "K=0 must start a fresh track"

    ids2 = run(2)
    assert ids2[1, 0] == ids2[4, 0], \
        "K=2 must revive the ID across a 2-frame gap"
    assert ids2[4, 0] == ids2[5, 0]

    ids1 = run(1)           # gap (2 frames) exceeds K=1 -> fresh track
    assert ids1[1, 0] != ids1[4, 0], "expired ghost must not revive"

    # Outputs stay [T, N]; padded slots -1 throughout.
    assert ids2.shape == (T, Ns) and (ids2[:, 1:] == -1).all()


def test_windowed_streaming_invariance_across_configs():
    """THE streaming contract: chaining the window program with carried
    TrackerState equals one whole-sequence pass — bit-equal ids — under
    every association configuration the runner ships (plain / y_det
    hybrid / revival ghosts / spatial gate / sinkhorn), not just the
    flagship point."""
    from mmmot_tpu.config import (AffinityConfig, AppearanceConfig,
                                  FusionConfig, ModelConfig, NewEndConfig,
                                  PointConfig)
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence_from_frames

    cfg = ModelConfig(
        appearance=AppearanceConfig(depth=11, crop_size=(32, 32),
                                    reduction_dim=16, out_dim=32,
                                    width_mult=0.0625),
        point=PointConfig(point_len=8, channels=(16, 32), out_dim=32),
        fusion=FusionConfig(variant="C", out_dim=32),
        affinity=AffinityConfig(hidden_dim=16),
        new_end=NewEndConfig(hidden_dim=16),
    )
    net = model_entry(cfg)
    T, Ns, P, H, W = 6, 4, 8, 48, 96
    key = jax.random.PRNGKey(3)
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        key, batch)

    rng = np.random.default_rng(17)
    images = jnp.asarray(rng.integers(0, 255, (T, H, W, 3)), jnp.uint8)
    clouds = np.zeros((T, 64, 4), np.float32)
    clouds[..., 0] = rng.uniform(-10, 10, (T, 64))
    clouds[..., 1] = rng.uniform(-2, 2, (T, 64))
    clouds[..., 2] = rng.uniform(2, 30, (T, 64))
    clouds = jnp.asarray(clouds)
    proj = jnp.asarray([[50.0, 0, W / 2, 0], [0, 50.0, H / 2, 0],
                        [0, 0, 1, 0]], jnp.float32)
    # drifting boxes with a dropout gap so revival/gate paths act
    boxes = np.zeros((T, Ns, 4), np.float32)
    det_mask = np.zeros((T, Ns), bool)
    for t in range(T):
        for i in range(3):
            if i == 1 and t in (2, 3):     # track 1 drops for 2 frames
                continue
            x = 6 + 3 * t + 22 * i
            boxes[t, i] = [x, 10 + 5 * i, x + 18, 30 + 5 * i]
            det_mask[t, i] = True
    boxes = jnp.asarray(boxes)
    det_mask = jnp.asarray(det_mask)

    variants = [
        AssocConfig(solver="auction"),
        AssocConfig(solver="auction", use_det_scores=True,
                    raw_new_end=True),
        AssocConfig(solver="auction", revival_window=2),
        AssocConfig(solver="auction", revival_window=2, iou_weight=1.0,
                    iou_gate=0.05),
        AssocConfig(solver="auction", revival_window=2, iou_weight=1.0,
                    iou_gate=0.05, ghost_coverage=True),
        AssocConfig(solver="auction", revival_window=2, use_det_scores=True,
                    raw_new_end=True, ghost_coverage=True),
        AssocConfig(solver="sinkhorn"),
    ]
    for acfg in variants:
        module = TrackingModule(net, vars_, acfg)

        def run(im, cl, bx, dm, state0=None):
            cap = im.shape[0] * Ns          # every slot fits (no drops)
            fn = jax.jit(lambda i, c, b, d, s: track_sequence_from_frames(
                module, i, c, b, d, proj, (32, 32), P,
                compact_capacity=cap, extract_chunk=4, crop_window=64,
                state0=s, return_state=True))
            out, final = fn(im, cl, bx, dm, state0)
            assert int(out["n_dropped"]) == 0
            return out, final

        whole, _ = run(images, clouds, boxes, det_mask,
                       module.init_state(Ns))
        st = module.init_state(Ns)
        chunks = []
        gchunks = []
        for w0 in (0, 3):
            out, st = run(images[w0:w0 + 3], clouds[w0:w0 + 3],
                          boxes[w0:w0 + 3], det_mask[w0:w0 + 3], st)
            chunks.append(np.asarray(out["ids"]))
            if acfg.ghost_coverage:
                gchunks.append((np.asarray(out["ghost_ids"]),
                                np.asarray(out["ghost_boxes"])))
        got = np.concatenate(chunks)
        np.testing.assert_array_equal(
            got, np.asarray(whole["ids"]),
            err_msg=f"windowed != whole for {acfg}")
        if acfg.ghost_coverage:
            # Coverage rows split across the window boundary (entry band +
            # carried velocities) must equal the whole pass too.
            np.testing.assert_array_equal(
                np.concatenate([g[0] for g in gchunks]),
                np.asarray(whole["ghost_ids"]),
                err_msg=f"windowed ghost ids != whole for {acfg}")
            np.testing.assert_allclose(
                np.concatenate([g[1] for g in gchunks]),
                np.asarray(whole["ghost_boxes"]), atol=1e-4,
                err_msg=f"windowed ghost boxes != whole for {acfg}")
