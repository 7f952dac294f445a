"""Int8 post-training quantization of the appearance trunk.

models/quantize.py: BN-folded per-channel int8 weights, calibrated
per-tensor activation scales, int8 max-pools, float skip-pool tail.
Checks numerical closeness to the float trunk and that the full tracking
pipeline runs (and agrees) with the quantized trunk swapped in.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.configs import tiny
from mmmot_tpu.models import model_entry
from mmmot_tpu.models.quantize import (calibrate_appearance,
                                       quantize_appearance,
                                       quantized_appearance_apply,
                                       with_int8_appearance)
from mmmot_tpu.tracker.sequence import track_sequence
from mmmot_tpu.tracker.tracker import TrackingModule


def make_net(compute_dtype="float32", s2d_stem=False):
    cfg = tiny().model
    cfg = dataclasses.replace(
        cfg, compute_dtype=compute_dtype,
        appearance=dataclasses.replace(cfg.appearance, s2d_stem=s2d_stem))
    net = model_entry(cfg)
    N, P, (h, w) = 8, cfg.point.point_len, cfg.appearance.crop_size
    dummy = {
        "crops": jnp.zeros((1, 2, N, h, w, 3)),
        "points": jnp.zeros((1, 2, N, P, 4)),
        "point_mask": jnp.ones((1, 2, N, P), bool),
        "det_mask": jnp.ones((1, 2, N), bool),
    }
    variables = jax.jit(
        lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), dummy)
    return cfg, net, variables


def rand_crops(r, shape):
    # ImageNet-normalised-looking crops: roughly [-2.6, 2.7]
    return jnp.asarray(r.normal(0.0, 1.0, shape).astype(np.float32))


@pytest.mark.parametrize("s2d", [False, True])
def test_quantized_trunk_matches_float(s2d):
    """Quantized appearance features track the float features closely
    (random-init net; per-channel weights + calibrated activations) —
    including the space-to-depth stem (the int8 path must mirror the SAME
    trunk_ops sequence, with the relayout commuting with quantization)."""
    cfg, net, variables = make_net(s2d_stem=s2d)
    r = np.random.default_rng(1)
    crops = rand_crops(r, (12, *cfg.appearance.crop_size, 3))
    mask = jnp.asarray(np.arange(12) < 10)

    ref = net.apply(variables, crops, mask, False,
                    method=lambda m, c, mk, t: m.appear_net(c, mk, t))
    scales = calibrate_appearance(variables, cfg.appearance, crops)
    quant = quantize_appearance(variables, cfg.appearance, scales)
    q = quantized_appearance_apply(quant, variables, cfg.appearance,
                                   crops, mask)

    ref, q = np.asarray(ref, np.float64), np.asarray(q, np.float64)
    assert q.shape == ref.shape
    # masked slots exactly zero
    np.testing.assert_array_equal(q[10:], 0.0)
    # cosine similarity per valid detection
    num = (ref[:10] * q[:10]).sum(-1)
    den = np.linalg.norm(ref[:10], axis=-1) * np.linalg.norm(q[:10], axis=-1)
    cos = num / np.maximum(den, 1e-12)
    assert cos.min() > 0.99, cos
    rel = np.linalg.norm(q[:10] - ref[:10]) / np.linalg.norm(ref[:10])
    assert rel < 0.1, rel


def test_calibration_scale_count_checked():
    cfg, net, variables = make_net()
    with pytest.raises(ValueError, match="calibration scales"):
        quantize_appearance(variables, cfg.appearance, (1.0, 2.0))


def test_tracking_pipeline_with_int8_trunk():
    """Full synthetic tracking runs with the quant collection riding the
    variables dict, and IDs agree with the float pipeline on
    well-separated detections."""
    cfg, net, variables = make_net()
    r = np.random.default_rng(2)
    T, N, P = 4, 8, cfg.point.point_len
    h, w = cfg.appearance.crop_size
    # three persistent, visually distinct detections per frame
    base = r.normal(0, 1, (3, h, w, 3)).astype(np.float32)
    crops = np.zeros((T, N, h, w, 3), np.float32)
    points = r.normal(0, 1, (T, N, P, 4)).astype(np.float32)
    for t in range(T):
        crops[t, :3] = base + 0.01 * r.normal(0, 1, base.shape)
    det_mask = np.zeros((T, N), bool)
    det_mask[:, :3] = True
    point_mask = np.broadcast_to(det_mask[..., None], (T, N, P)).copy()

    crops, points = jnp.asarray(crops), jnp.asarray(points)
    point_mask, det_mask = jnp.asarray(point_mask), jnp.asarray(det_mask)

    m_f32 = TrackingModule(net, variables, use_pallas_affinity=False)
    out_ref = jax.jit(lambda c, p, pm, dm: track_sequence(
        m_f32, c, p, pm, dm))(crops, points, point_mask, det_mask)

    qvars = with_int8_appearance(variables, cfg.appearance,
                                 crops[det_mask.reshape(T, N)])
    m_q = TrackingModule(net, qvars, use_pallas_affinity=False)
    out_q = jax.jit(lambda c, p, pm, dm: track_sequence(
        m_q, c, p, pm, dm))(crops, points, point_mask, det_mask)

    ids_ref = np.asarray(out_ref["ids"])
    ids_q = np.asarray(out_q["ids"])
    assert ids_q.shape == ids_ref.shape
    np.testing.assert_array_equal(ids_q, ids_ref)


def test_int8_trunk_bf16_pipeline_runs():
    """The quantized trunk feeds the bf16 compute path (flagship dtype)."""
    cfg, net, variables = make_net(compute_dtype="bfloat16")
    r = np.random.default_rng(3)
    N, P = 8, cfg.point.point_len
    h, w = cfg.appearance.crop_size
    crops = rand_crops(r, (2, N, h, w, 3))
    qvars = with_int8_appearance(variables, cfg.appearance, crops)
    m = TrackingModule(net, qvars, use_pallas_affinity=False)
    feats = m.extract(crops, jnp.zeros((2, N, P, 4)),
                      jnp.ones((2, N, P), bool), jnp.ones((2, N), bool))
    assert feats["fused"].shape == (2, N, cfg.fusion.out_dim)
    assert np.isfinite(np.asarray(feats["fused"], np.float32)).all()
