"""Spatial association gate (AssocConfig.iou_gate / iou_weight).

A TPU-native addition over the reference (which associates on appearance
only): link scores get an optional soft IoU prior and/or a hard IoU floor,
applied identically across the sequential scan, the parallel pre-solve and
the hybrid y_det pre-solve (equality tested here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.config import (AffinityConfig, AppearanceConfig, AssocConfig,
                              FusionConfig, ModelConfig, NewEndConfig,
                              PointConfig)
from mmmot_tpu.models import model_entry
from mmmot_tpu.ops.boxes import pairwise_iou
from mmmot_tpu.tracker import TrackingModule, track_sequence
from mmmot_tpu.tracker.tracker import apply_spatial_gate


def test_pairwise_iou_matches_numpy_oracle(rng):
    from mmmot_tpu.eval.kitti_devkit import iou_2d

    a = rng.uniform(0, 100, (7, 4)).astype(np.float32)
    b = rng.uniform(0, 100, (5, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:]) + 1
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:]) + 1
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, iou_2d(a, b), atol=1e-5)
    # Batched leading dims broadcast.
    got_b = np.asarray(pairwise_iou(jnp.asarray(a)[None], jnp.asarray(b)[None]))
    np.testing.assert_allclose(got_b[0], got, atol=1e-6)
    # Degenerate (zero-area) boxes give IoU 0, not NaN.
    z = jnp.zeros((2, 4))
    assert not np.isnan(np.asarray(pairwise_iou(z, jnp.asarray(b)))).any()


def test_apply_spatial_gate_math():
    from mmmot_tpu.assoc.cost import NEG

    bp = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    bc = jnp.asarray([[0, 0, 10, 10], [200, 200, 210, 210]], jnp.float32)
    link = jnp.zeros((2, 2))
    out = apply_spatial_gate(link, bp, bc, AssocConfig(iou_weight=2.0))
    assert out[0, 0] == pytest.approx(2.0)      # perfect overlap: +w*1
    assert out[1, 1] == pytest.approx(0.0)      # no overlap: unchanged
    out = apply_spatial_gate(link, bp, bc, AssocConfig(iou_gate=0.5))
    assert out[0, 0] == 0.0
    assert float(out[0, 1]) == pytest.approx(NEG)
    assert float(out[1, 1]) == pytest.approx(NEG)


def _tiny_module(assoc, **kw):
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
    Ns, P = 4, 8
    key = jax.random.PRNGKey(0)
    batch = {"crops": jnp.zeros((1, 2, Ns, 32, 32, 3)),
             "points": jnp.zeros((1, 2, Ns, P, 4)),
             "point_mask": jnp.ones((1, 2, Ns, P), bool),
             "det_mask": jnp.ones((1, 2, Ns), bool)}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        key, batch)
    return TrackingModule(net, vars_, assoc, **kw), Ns, P


def _identical_appearance_inputs(T, Ns, P):
    """Every detection has the SAME crop/points -> appearance affinity is
    fully ambiguous; only the spatial prior can disambiguate."""
    key = jax.random.PRNGKey(7)
    crop1 = jax.random.normal(key, (32, 32, 3))
    pts1 = jax.random.normal(key, (P, 4))
    crops = jnp.broadcast_to(crop1, (T, Ns, 32, 32, 3))
    points = jnp.broadcast_to(pts1, (T, Ns, P, 4))
    pm = jnp.ones((T, Ns, P), bool)
    return crops, points, pm


def test_iou_prior_disambiguates_identical_appearance():
    T, box_a, box_b = 5, [0, 0, 50, 50], [300, 0, 350, 50]
    module, Ns, P = _tiny_module(AssocConfig(iou_weight=5.0))
    crops, points, pm = _identical_appearance_inputs(T, Ns, P)
    dm = jnp.zeros((T, Ns), bool).at[:, :2].set(True)
    boxes = jnp.zeros((T, Ns, 4)).at[:, 0].set(jnp.asarray(box_a, jnp.float32)
                                               ).at[:, 1].set(
        jnp.asarray(box_b, jnp.float32))
    out = jax.jit(lambda c, p, q, d, b: track_sequence(
        module, c, p, q, d, boxes=b))(crops, points, pm, dm, boxes)
    ids = np.asarray(out["ids"])
    # Stationary boxes + IoU prior: ids stay put across every frame.
    assert (ids[:, 0] == ids[0, 0]).all()
    assert (ids[:, 1] == ids[0, 1]).all()
    assert ids[0, 0] != ids[0, 1]


def test_iou_gate_forbids_teleport_link():
    # One det per frame, same appearance, but the box teleports at t=2:
    # with a hard gate the track must END and a NEW id start.
    T = 4
    module, Ns, P = _tiny_module(AssocConfig(iou_gate=0.3))
    crops, points, pm = _identical_appearance_inputs(T, Ns, P)
    dm = jnp.zeros((T, Ns), bool).at[:, 0].set(True)
    boxes = jnp.zeros((T, Ns, 4))
    boxes = boxes.at[:2, 0].set(jnp.asarray([0, 0, 50, 50], jnp.float32))
    boxes = boxes.at[2:, 0].set(jnp.asarray([500, 0, 550, 50], jnp.float32))
    out = jax.jit(lambda c, p, q, d, b: track_sequence(
        module, c, p, q, d, boxes=b))(crops, points, pm, dm, boxes)
    ids = np.asarray(out["ids"])[:, 0]
    assert ids[0] == ids[1]
    assert ids[2] != ids[1]          # gate forbids the teleport link
    assert ids[2] == ids[3]
    # Control: without the gate the (identical) appearance links it.
    module0, _, _ = _tiny_module(AssocConfig())
    out0 = jax.jit(lambda c, p, q, d: track_sequence(
        module0, c, p, q, d))(crops, points, pm, dm)
    ids0 = np.asarray(out0["ids"])[:, 0]
    assert (ids0 == ids0[0]).all()


@pytest.mark.parametrize("assoc_kw", [
    dict(iou_weight=2.0),
    dict(iou_gate=0.2),
    dict(iou_weight=2.0, iou_gate=0.2, use_det_scores=True),
])
def test_gated_parallel_and_hybrid_match_sequential(assoc_kw, rng):
    T, key = 6, jax.random.PRNGKey(3)
    assoc = AssocConfig(**assoc_kw)
    hybrid = assoc.use_det_scores
    mod_fast, Ns, P = _tiny_module(
        assoc, parallel_assoc=not hybrid, hybrid_presolve=hybrid)
    mod_seq, _, _ = _tiny_module(assoc, parallel_assoc=False,
                                 hybrid_presolve=False)
    crops = jnp.asarray(rng.normal(0, 1, (T, Ns, 32, 32, 3)).astype(
        np.float32))
    points = jnp.asarray(rng.normal(0, 1, (T, Ns, P, 4)).astype(np.float32))
    pm = jnp.ones((T, Ns, P), bool)
    dm = jnp.asarray(np.arange(Ns)[None, :]
                     < rng.integers(1, Ns + 1, (T, 1)))
    cx = rng.uniform(50, 500, (T, Ns))
    boxes = np.stack([cx, np.full_like(cx, 10), cx + 60,
                      np.full_like(cx, 90)], -1).astype(np.float32)
    boxes = jnp.asarray(boxes)
    outs = [jax.jit(lambda c, p, q, d, b, m=m: track_sequence(
        m, c, p, q, d, boxes=b))(crops, points, pm, dm, boxes)
        for m in (mod_fast, mod_seq)]
    np.testing.assert_array_equal(np.asarray(outs[0]["ids"]),
                                  np.asarray(outs[1]["ids"]))


def test_gating_without_boxes_raises():
    module, Ns, P = _tiny_module(AssocConfig(iou_weight=1.0),
                                 parallel_assoc=False,
                                 hybrid_presolve=False)
    crops, points, pm = _identical_appearance_inputs(2, Ns, P)
    dm = jnp.ones((2, Ns), bool)
    with pytest.raises((ValueError, KeyError)):
        jax.jit(lambda c, p, q, d: track_sequence(
            module, c, p, q, d))(crops, points, pm, dm)


def test_gate_with_revival_window():
    # Gate + ghost revival: a 1-frame dropout revives the SAME id when the
    # detection reappears nearby.
    T = 5
    module, Ns, P = _tiny_module(AssocConfig(iou_gate=0.3,
                                             revival_window=2))
    crops, points, pm = _identical_appearance_inputs(T, Ns, P)
    dm = jnp.zeros((T, Ns), bool).at[:, 0].set(True).at[2, 0].set(False)
    boxes = jnp.zeros((T, Ns, 4)).at[:, 0].set(
        jnp.asarray([0, 0, 50, 50], jnp.float32))
    out = jax.jit(lambda c, p, q, d, b: track_sequence(
        module, c, p, q, d, boxes=b))(crops, points, pm, dm, boxes)
    ids = np.asarray(out["ids"])[:, 0]
    assert ids[0] == ids[1] == ids[3] == ids[4]
    assert ids[2] == -1
