"""Learned motion affinity (AffinityConfig.motion_dim).

TPU-native addition over the reference (SURVEY §2.8 — the reference ILP
scores links by appearance only): an MLP over per-pair box-geometry
features adds a TRAINED motion term to the raw link score, before
normalisation and the new/end heads.  Unlike the hard IoU gate it is
learned end-to-end through the association CE; unlike gnn_rounds it is
mask-independent (boxes are frozen content), so it must compose with the
fused Pallas kernel and EVERY pre-solve — equality is pinned here.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.config import (AffinityConfig, AppearanceConfig, AssocConfig,
                              FusionConfig, ModelConfig, NewEndConfig,
                              PointConfig)
from mmmot_tpu.models import model_entry
from mmmot_tpu.ops.boxes import (MOTION_FEATURE_DIM, pair_motion_features,
                                 pairwise_iou)
from mmmot_tpu.tracker import TrackingModule, track_sequence

NS, P, CROP = 4, 8, (32, 32)


def _cfg(motion_dim=8, **kw):
    return ModelConfig(
        appearance=AppearanceConfig(depth=11, crop_size=CROP,
                                    reduction_dim=16, out_dim=32,
                                    width_mult=0.0625),
        point=PointConfig(point_len=P, channels=(16, 32), out_dim=32),
        fusion=FusionConfig(variant="C", out_dim=32),
        affinity=AffinityConfig(hidden_dim=16, motion_dim=motion_dim),
        new_end=NewEndConfig(hidden_dim=16),
        **kw)


def _init_vars(net, with_boxes=True):
    batch = {"crops": jnp.zeros((1, 2, NS) + CROP + (3,)),
             "points": jnp.zeros((1, 2, NS, P, 4)),
             "point_mask": jnp.ones((1, 2, NS, P), bool),
             "det_mask": jnp.ones((1, 2, NS), bool)}
    if with_boxes:
        batch["boxes"] = jnp.zeros((1, 2, NS, 4))
    return jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)


def _module(assoc=None, motion_dim=8, **kw):
    net = model_entry(_cfg(motion_dim=motion_dim))
    vars_ = _init_vars(net)
    return TrackingModule(net, vars_, assoc or AssocConfig(), **kw), net, \
        vars_


def _set_motion_iou_params(vars_, weight=10.0):
    """Hand-set the motion MLP to compute exactly ``weight * IoU``: the
    first layer selects the IoU feature (index 4, nonnegative so relu is a
    no-op into unit 0) and the zero-initialised output layer reads it."""
    params = jax.tree.map(lambda x: x, vars_["params"])  # shallow copy ok
    m = params["motion"]
    d0 = m["dense_0"]
    k0 = jnp.zeros_like(d0["kernel"]).at[4, 0].set(1.0)
    d1 = m["dense_1"]
    k1 = jnp.zeros_like(d1["kernel"]).at[0, 0].set(weight)
    params = dict(params, motion={
        "dense_0": dict(d0, kernel=k0, bias=jnp.zeros_like(d0["bias"])),
        "dense_1": dict(d1, kernel=k1, bias=jnp.zeros_like(d1["bias"]))})
    return dict(vars_, params=params)


def _rand_motion_params(vars_, rng):
    """Random nonzero motion MLP (the zero output init would make
    kernel-vs-XLA equality vacuous)."""
    params = jax.tree.map(lambda x: x, vars_["params"])
    m = params["motion"]
    params = dict(params, motion=jax.tree.map(
        lambda x: jnp.asarray(rng.normal(0, 0.5, x.shape), jnp.float32), m))
    return dict(vars_, params=params)


# ---------------------------------------------------------------- features

def test_pair_motion_features_values():
    a = jnp.asarray([[10.0, 20.0, 50.0, 60.0]])
    g_same = np.asarray(pair_motion_features(a, a))[0, 0]
    np.testing.assert_allclose(g_same[:4], 0.0, atol=1e-6)   # dx dy dw dh
    assert g_same[4] == pytest.approx(1.0)                   # iou
    assert g_same[5] == pytest.approx(0.0)                   # dist
    # A known displacement: +40 px on a 40x40 box (scale 40) -> dx = 1.
    b = a + jnp.asarray([[40.0, 0.0, 40.0, 0.0]])
    g = np.asarray(pair_motion_features(a, b))[0, 0]
    assert g[0] == pytest.approx(1.0)
    assert g[1] == pytest.approx(0.0)
    assert g[4] == pytest.approx(0.0)            # disjoint
    assert g[5] == pytest.approx(1.0)
    # Doubled width: dw = log 2.
    c = jnp.asarray([[10.0, 20.0, 90.0, 60.0]])
    g = np.asarray(pair_motion_features(a, c))[0, 0]
    assert g[2] == pytest.approx(np.log(2.0))
    assert g.shape == (MOTION_FEATURE_DIM,)


def test_pair_motion_features_degenerate_boxes_finite():
    z = jnp.zeros((3, 4))
    b = jnp.asarray([[0.0, 0.0, 1e6, 1e6], [5, 5, 5, 5], [0, 0, 0, 0]])
    for x, y in ((z, b), (b, z), (z, z)):
        g = np.asarray(pair_motion_features(x, y))
        assert np.isfinite(g).all()
    # Displacements clamp at +-20 scales.
    far = jnp.asarray([[1e9, 1e9, 1e9 + 10, 1e9 + 10]])
    g = np.asarray(pair_motion_features(jnp.asarray([[0, 0, 10, 10.0]]),
                                        far))
    assert (np.abs(g[..., :2]) <= 20.0).all() and np.isfinite(g).all()


def test_motion_dim_validation():
    with pytest.raises(ValueError):
        AffinityConfig(motion_dim=-1)


# ---------------------------------------------------------- model plumbing

def test_zero_init_motion_is_exact_noop(rng):
    """A freshly-initialised motion model scores exactly like the
    appearance-only architecture (zero-init output layer)."""
    net_m = model_entry(_cfg(motion_dim=8))
    net_0 = model_entry(_cfg(motion_dim=0))
    vars_m = _init_vars(net_m)
    vars_0 = _init_vars(net_0, with_boxes=False)
    batch = {
        "crops": jnp.asarray(rng.normal(0, 1, (2, 2, NS) + CROP + (3,)),
                             jnp.float32),
        "points": jnp.asarray(rng.normal(0, 1, (2, 2, NS, P, 4)),
                              jnp.float32),
        "point_mask": jnp.ones((2, 2, NS, P), bool),
        "boxes": jnp.asarray(rng.uniform(0, 200, (2, 2, NS, 4)),
                             jnp.float32),
        "det_mask": jnp.ones((2, 2, NS), bool)}
    out_m = net_m.apply(vars_m, batch, train=False)
    out_0 = net_0.apply(vars_0, {k: v for k, v in batch.items()
                                 if k != "boxes"}, train=False)
    for k in ("link", "link_norm", "new", "end"):
        np.testing.assert_allclose(np.asarray(out_m[k]),
                                   np.asarray(out_0[k]), atol=1e-6)


def test_training_forward_without_boxes_raises():
    net = model_entry(_cfg(motion_dim=8))
    vars_ = _init_vars(net)
    batch = {"crops": jnp.zeros((1, 2, NS) + CROP + (3,)),
             "points": jnp.zeros((1, 2, NS, P, 4)),
             "point_mask": jnp.ones((1, 2, NS, P), bool),
             "det_mask": jnp.ones((1, 2, NS), bool)}
    with pytest.raises(ValueError, match="boxes"):
        net.apply(vars_, batch, train=False)


def test_tracking_without_boxes_raises():
    module, _, _ = _module(parallel_assoc=False, hybrid_presolve=False)
    crops = jnp.zeros((2, NS) + CROP + (3,))
    points = jnp.zeros((2, NS, P, 4))
    pm = jnp.ones((2, NS, P), bool)
    dm = jnp.ones((2, NS), bool)
    with pytest.raises((ValueError, KeyError)):
        track_sequence(module, crops, points, pm, dm)


def test_motion_grads_flow_through_association_ce(rng):
    """One train step: the CE gradient reaches the motion output layer
    (the zero-init kernel gets a nonzero gradient)."""
    from mmmot_tpu.config import TrainConfig
    from mmmot_tpu.data.synthetic import make_training_batch
    from mmmot_tpu.train.trainer import create_train_state, train_step

    net = model_entry(_cfg(motion_dim=8))
    batch = {k: jnp.asarray(v) for k, v in make_training_batch(
        rng, batch_size=2, num_slots=NS, crop_size=CROP,
        points_per_det=P).items()}
    state = create_train_state(
        net, TrainConfig(lr=1e-3, epochs=1, lr_schedule="constant",
                         warmup_steps=0),
        jax.random.PRNGKey(0), batch)
    assert "motion" in state.params

    def loss_fn(params):
        from mmmot_tpu.train.losses import tracking_loss

        out, _ = net.apply({"params": params,
                            "batch_stats": state.batch_stats},
                           batch, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return tracking_loss(out, batch)[0]

    grads = jax.grad(loss_fn)(state.params)
    g1 = np.asarray(grads["motion"]["dense_1"]["kernel"])
    assert np.abs(g1).max() > 0.0
    # And the step runs end-to-end.
    state2, metrics = jax.jit(
        lambda s, b, r: train_step(net, s, b, r))(
        state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total"]))
    assert np.abs(np.asarray(
        state2.params["motion"]["dense_1"]["kernel"])).max() > 0.0


# ------------------------------------------------------------ kernel parity

def test_motion_kernel_matches_xla(rng):
    """Fused kernel (link_bias input) == XLA path, nonzero motion MLP."""
    module, net, vars_ = _module()
    vars_ = _rand_motion_params(vars_, rng)
    feats = {}
    for side in ("p", "c"):
        feats[side] = {b: jnp.asarray(rng.normal(0, 1, (NS, 32)),
                                      jnp.float32)
                       for b in ("fused", "image", "lidar")}
        feats[side]["box"] = jnp.asarray(
            rng.uniform(0, 300, (NS, 4)), jnp.float32)
    mp = jnp.asarray([True, True, True, False])
    mc = jnp.asarray([True, True, False, False])
    xla = net.apply(vars_, feats["p"], feats["c"], mp, mc, train=False,
                    method=net.affinity)
    mod = TrackingModule(net, vars_, AssocConfig(),
                         use_pallas_affinity=True, pallas_interpret=True)
    pal = mod._affinity_pallas(feats["p"], feats["c"], mp, mc)
    for k in ("link", "link_norm", "new", "end"):
        np.testing.assert_allclose(np.asarray(getattr(pal, k)),
                                   np.asarray(getattr(xla, k)),
                                   rtol=1e-5, atol=1e-5)
    # The bias genuinely bites: zeroing the boxes changes the link.
    z = {**feats["c"], "box": jnp.zeros((NS, 4))}
    pal0 = mod._affinity_pallas(feats["p"], z, mp, mc)
    assert np.abs(np.asarray(pal.link) - np.asarray(pal0.link)).max() > 1e-4


# ------------------------------------------------------- strategy equality

@pytest.mark.parametrize("assoc_kw,fast_kw", [
    (dict(), dict(parallel_assoc=True)),
    (dict(use_det_scores=True), dict(hybrid_presolve=True)),
    (dict(revival_window=2), dict(hybrid_presolve=True)),
    (dict(use_det_scores=True, revival_window=2, iou_gate=0.05),
     dict(hybrid_presolve=True)),
])
def test_motion_presolves_match_sequential(assoc_kw, fast_kw, rng):
    T = 6
    assoc = AssocConfig(**assoc_kw)
    mod_fast, net, vars_ = _module(assoc, **fast_kw)
    vars_ = _rand_motion_params(vars_, rng)
    mod_fast = TrackingModule(net, vars_, assoc, **fast_kw)
    mod_seq = TrackingModule(net, vars_, assoc, parallel_assoc=False,
                             hybrid_presolve=False)
    crops = jnp.asarray(rng.normal(0, 1, (T, NS) + CROP + (3,)),
                        jnp.float32)
    points = jnp.asarray(rng.normal(0, 1, (T, NS, P, 4)), jnp.float32)
    pm = jnp.ones((T, NS, P), bool)
    dm = jnp.asarray(np.arange(NS)[None, :]
                     < rng.integers(1, NS + 1, (T, 1)))
    cx = rng.uniform(50, 500, (T, NS))
    boxes = jnp.asarray(np.stack(
        [cx, np.full_like(cx, 10), cx + 60, np.full_like(cx, 90)],
        -1).astype(np.float32))
    outs = [jax.jit(lambda c, p, q, d, b, m=m: track_sequence(
        m, c, p, q, d, boxes=b))(crops, points, pm, dm, boxes)
        for m in (mod_fast, mod_seq)]
    np.testing.assert_array_equal(np.asarray(outs[0]["ids"]),
                                  np.asarray(outs[1]["ids"]))


# ------------------------------------------------------------- behaviour

def test_motion_disambiguates_identical_appearance():
    """Two identical-appearance objects, stationary boxes: with the motion
    MLP hand-set to score IoU, ids stay put; the appearance-only control
    has no signal to hold them."""
    T = 5
    module, net, vars_ = _module(parallel_assoc=False,
                                 hybrid_presolve=False)
    vars_ = _set_motion_iou_params(vars_, weight=10.0)
    module = TrackingModule(net, vars_, AssocConfig(),
                            parallel_assoc=False, hybrid_presolve=False)
    key = jax.random.PRNGKey(7)
    crop1 = jax.random.normal(key, CROP + (3,))
    pts1 = jax.random.normal(key, (P, 4))
    crops = jnp.broadcast_to(crop1, (T, NS) + CROP + (3,))
    points = jnp.broadcast_to(pts1, (T, NS, P, 4))
    pm = jnp.ones((T, NS, P), bool)
    dm = jnp.zeros((T, NS), bool).at[:, :2].set(True)
    boxes = jnp.zeros((T, NS, 4)).at[:, 0].set(
        jnp.asarray([0, 0, 50, 50], jnp.float32)).at[:, 1].set(
        jnp.asarray([300, 0, 350, 50], jnp.float32))
    out = jax.jit(lambda c, p, q, d, b: track_sequence(
        module, c, p, q, d, boxes=b))(crops, points, pm, dm, boxes)
    ids = np.asarray(out["ids"])
    assert (ids[:, 0] == ids[0, 0]).all()
    assert (ids[:, 1] == ids[0, 1]).all()
    assert ids[0, 0] != ids[0, 1]
    # The hand-set IoU motion term reproduces apply_spatial_gate's
    # iou_weight prior up to normalisation placement — sanity-check the
    # bias itself.
    bias = net.apply(vars_, boxes[0], boxes[0], dm[0], dm[0],
                     method=net.motion_bias)
    iou = pairwise_iou(boxes[0], boxes[0])
    np.testing.assert_allclose(np.asarray(bias),
                               10.0 * np.asarray(iou)
                               * np.asarray(dm[0][:, None] & dm[0][None, :],
                                            np.float32), atol=1e-5)


def test_motion_learns_to_separate_clones(rng):
    """End-to-end: on a clone regime (identical appearance, distinct
    motion) training WITH motion_dim reaches a link CE the appearance-only
    model provably cannot (its two candidates are indistinguishable, so
    ce_prev is pinned near ln(2))."""
    from mmmot_tpu.config import TrainConfig
    from mmmot_tpu.train.trainer import create_train_state, train_step

    T, B = 2, 8
    key = jax.random.PRNGKey(11)
    crop1 = jax.random.normal(key, CROP + (3,))
    pts1 = jax.random.normal(key, (P, 4))

    def make_batch(r):
        crops = np.broadcast_to(np.asarray(crop1),
                                (B, T, NS) + CROP + (3,)).copy()
        points = np.broadcast_to(np.asarray(pts1),
                                 (B, T, NS, P, 4)).copy()
        boxes = np.zeros((B, T, NS, 4), np.float32)
        gt_ids = np.full((B, T, NS), -1, np.int32)
        dm = np.zeros((B, T, NS), bool)
        link = np.zeros((B, 1, NS, NS), np.float32)
        for i in range(B):
            # Two clones near x0 and x0+150, both drift +8 px/frame.
            x0 = r.uniform(50, 300)
            for j, xx in enumerate((x0, x0 + 150.0)):
                for t in range(T):
                    boxes[i, t, j] = (xx + 8.0 * t, 50, xx + 8.0 * t + 60,
                                      110)
                    dm[i, t, j] = True
                    gt_ids[i, t, j] = j
                link[i, 0, j, j] = 1.0
        return {"crops": jnp.asarray(crops), "points": jnp.asarray(points),
                "point_mask": jnp.ones((B, T, NS, P), bool),
                "boxes": jnp.asarray(boxes), "det_mask": jnp.asarray(dm),
                "gt_ids": jnp.asarray(gt_ids),
                "gt_link": jnp.asarray(link),
                "gt_new": jnp.zeros((B, 1, NS)),
                "gt_end": jnp.zeros((B, 1, NS))}

    net = model_entry(_cfg(motion_dim=8))
    batch0 = make_batch(rng)
    state = create_train_state(net, TrainConfig(lr=3e-3, epochs=1,
                                                lr_schedule="constant",
                                                warmup_steps=0),
                               jax.random.PRNGKey(0), batch0)
    step = jax.jit(lambda s, b, r: train_step(net, s, b, r))
    ce = None
    for i in range(40):
        state, metrics = step(state, make_batch(rng),
                              jax.random.PRNGKey(i))
        ce = float(metrics["ce_prev"])
    # Identical appearance: appearance-only candidates are symmetric, so
    # without motion ce_prev >= ln(2) (up to BN jitter).  Motion breaks
    # the tie decisively.
    assert ce < 0.45, f"motion failed to separate clones: ce_prev={ce}"
    assert np.abs(np.asarray(
        state.params["motion"]["dense_1"]["kernel"])).max() > 0.0
