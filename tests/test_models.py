"""Model-layer tests: shapes, mask invariance, sensor dropout, variants.

The key regression surface is mask-correctness (SURVEY.md §7 hard part #3):
changing the *content* of padded slots must never change outputs on valid
slots.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.config import (AffinityConfig, AppearanceConfig, FusionConfig,
                              ModelConfig, NewEndConfig, PointConfig)
from mmmot_tpu.models import model_entry

B, T, N, P, HW, D = 2, 2, 6, 8, 32, 32


def tiny_cfg(**kw):
    base = dict(
        appearance=AppearanceConfig(depth=11, crop_size=(HW, HW),
                                    reduction_dim=16, out_dim=D,
                                    width_mult=0.0625),
        point=PointConfig(point_len=P, channels=(16, 32), out_dim=D),
        fusion=FusionConfig(variant="C", out_dim=D),
        affinity=AffinityConfig(hidden_dim=16),
        new_end=NewEndConfig(hidden_dim=16),
    )
    base.update(kw)
    return ModelConfig(**base)


def make_batch(rng, det_counts):
    k = jax.random.PRNGKey(int(rng.integers(1 << 30)))
    det_mask = jnp.arange(N)[None, None, :] < jnp.asarray(det_counts)[..., None]
    return {
        "crops": jax.random.normal(k, (B, T, N, HW, HW, 3)),
        "points": jax.random.normal(k, (B, T, N, P, 4)),
        "point_mask": jnp.ones((B, T, N, P), bool),
        "det_mask": det_mask,
    }


@pytest.fixture(scope="module")
def net_and_vars():
    cfg = tiny_cfg()
    net = model_entry(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, [[3, 4], [5, 2]])
    key = jax.random.PRNGKey(0)
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        key, batch)
    return net, vars_, batch


def test_forward_shapes(net_and_vars):
    net, vars_, batch = net_and_vars
    out = jax.jit(lambda v, b: net.apply(v, b, train=False))(vars_, batch)
    assert out["link"].shape == (B, T - 1, N, N)
    assert out["new"].shape == (B, T - 1, N)
    assert out["end"].shape == (B, T - 1, N)
    assert out["det"].shape == (B, T, N)
    for v in out.values():
        assert not bool(jnp.isnan(v).any())


def test_padding_invariance(net_and_vars):
    """Garbage in padded slots must not change valid-slot outputs."""
    net, vars_, batch = net_and_vars
    f = jax.jit(lambda v, b: net.apply(v, b, train=False))
    out1 = f(vars_, batch)
    bad = dict(batch)
    pad = ~batch["det_mask"]
    bad["crops"] = batch["crops"] + 100.0 * pad[..., None, None, None]
    bad["points"] = batch["points"] - 55.0 * pad[..., None, None]
    out2 = f(vars_, bad)
    dm = np.asarray(batch["det_mask"])
    pmask = dm[:, :-1][..., :, None] & dm[:, 1:][..., None, :]
    np.testing.assert_allclose(np.asarray(out1["link"])[pmask],
                               np.asarray(out2["link"])[pmask],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1["new"])[dm[:, 1:]],
                               np.asarray(out2["new"])[dm[:, 1:]],
                               rtol=2e-4, atol=2e-5)


def test_masked_outputs_zero(net_and_vars):
    net, vars_, batch = net_and_vars
    out = jax.jit(lambda v, b: net.apply(v, b, train=False))(vars_, batch)
    dm = np.asarray(batch["det_mask"])
    pmask = dm[:, :-1][..., :, None] & dm[:, 1:][..., None, :]
    assert (np.asarray(out["link"])[~pmask] == 0).all()
    assert (np.asarray(out["new"])[~dm[:, 1:]] == 0).all()
    assert (np.asarray(out["det"])[~dm] == 0).all()


@pytest.mark.parametrize("variant", ["A", "B", "C"])
def test_fusion_variants(variant):
    cfg = tiny_cfg(fusion=FusionConfig(variant=variant, out_dim=D))
    net = model_entry(cfg)
    rng = np.random.default_rng(1)
    batch = make_batch(rng, [[2, 3], [3, 3]])
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(1), batch)
    out = jax.jit(lambda v, b: net.apply(v, b, train=False))(vars_, batch)
    assert not bool(jnp.isnan(out["link"]).any())


def test_sensor_dropout(net_and_vars):
    """Single-modality extraction works when a sensor is absent (paper's
    robustness story — reference keeps per-branch paths alive)."""
    net, vars_, batch = net_and_vars
    f_lidar = jax.jit(lambda v, b: net.apply(
        v, None, b["points"][:, 0], b["point_mask"][:, 0],
        b["det_mask"][:, 0], train=False, method=net.extract))
    f_image = jax.jit(lambda v, b: net.apply(
        v, b["crops"][:, 0], None, None, b["det_mask"][:, 0],
        train=False, method=net.extract))
    fl = f_lidar(vars_, batch)
    fi = f_image(vars_, batch)
    assert set(fl) == {"fused", "lidar"}
    assert set(fi) == {"fused", "image"}
    assert not bool(jnp.isnan(fl["fused"]).any())
    assert not bool(jnp.isnan(fi["fused"]).any())


def test_single_modality_configs():
    for kw in ({"use_image": False}, {"use_lidar": False}):
        cfg = tiny_cfg(**kw)
        net = model_entry(cfg)
        rng = np.random.default_rng(2)
        batch = make_batch(rng, [[2, 2], [2, 2]])
        vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
            jax.random.PRNGKey(2), batch)
        out = jax.jit(lambda v, b: net.apply(v, b, train=False))(vars_, batch)
        assert not bool(jnp.isnan(out["link"]).any())


def test_train_mode_updates_batch_stats(net_and_vars):
    net, vars_, batch = net_and_vars
    out, updates = jax.jit(lambda v, b, r: net.apply(
        v, b, train=True, mutable=["batch_stats"],
        rngs={"dropout": r}))(vars_, batch, jax.random.PRNGKey(3))
    before = jax.tree.leaves(vars_["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    assert changed


def test_s2d_stem_shapes_and_stage_map():
    """AppearanceConfig.s2d_stem (TPU stem redesign): a 2x2 space-to-depth
    replaces pool1, so the stage-1 convs see 12 input channels at half
    resolution while every stage's OUTPUT shape (and the embedding) is
    unchanged — downstream consumers (skip pool, int8 path, fusion) never
    see a different contract."""
    from mmmot_tpu.models.appearance import (VGGBackbone, space_to_depth,
                                             trunk_ops)

    # space_to_depth is a pure relayout: block pixels land in channels.
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    y = space_to_depth(x, 2)
    assert y.shape == (2, 2, 2, 12)
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0]),
        np.concatenate([np.asarray(x[0, 0, 0]), np.asarray(x[0, 0, 1]),
                        np.asarray(x[0, 1, 0]), np.asarray(x[0, 1, 1])]))

    # trunk_ops: same conv/stage counts, one fewer pool, s2d first.
    base = trunk_ops(11, False)
    s2d = trunk_ops(11, True)
    count = lambda ops, k: sum(1 for o in ops if o[0] == k)  # noqa: E731
    assert s2d[0] == ("s2d",)
    assert count(s2d, "conv") == count(base, "conv")
    assert count(s2d, "stage") == count(base, "stage") == 5
    assert count(s2d, "pool") == count(base, "pool") - 1

    key = jax.random.PRNGKey(0)
    xin = jax.random.normal(key, (3, HW, HW, 3))
    shapes = {}
    for s2d_on in (False, True):
        bb = VGGBackbone(depth=11, width_mult=0.0625, s2d_stem=s2d_on)
        vars_ = jax.jit(lambda x: bb.init(key, x))(xin)
        stages = jax.jit(lambda v, x: bb.apply(v, x))(vars_, xin)
        shapes[s2d_on] = [tuple(s.shape) for s in stages]
        if s2d_on:
            k0 = vars_["params"]["conv_0"]["kernel"]
            assert k0.shape[:3] == (3, 3, 12), k0.shape
    assert shapes[True] == shapes[False]

    # Full appearance net end-to-end: same embedding contract.
    cfg = tiny_cfg(appearance=AppearanceConfig(
        depth=11, crop_size=(HW, HW), reduction_dim=16, out_dim=D,
        width_mult=0.0625, s2d_stem=True))
    net = model_entry(cfg)
    rng = np.random.default_rng(3)
    batch = make_batch(rng, [[3, 4], [5, 2]])
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)
    out = jax.jit(lambda v, b: net.apply(v, b, train=False))(vars_, batch)
    assert out["link"].shape == (B, T - 1, N, N)

    # Odd crop sizes are rejected at config construction.
    with pytest.raises(ValueError, match="even crop dims"):
        AppearanceConfig(crop_size=(33, 33), s2d_stem=True)


def test_masked_bn_no_mask_train_under_jit():
    """mask=None + train mode must work under jit (regression: the valid-
    count used float() on a traced constant and raised
    ConcretizationTypeError; every in-package call passes a mask, so only
    external/compact all-valid use hit it)."""
    from mmmot_tpu.models.layers import MaskedBatchNorm

    bn = MaskedBatchNorm()
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 6, 3)),
                    jnp.float32)
    vars_ = jax.jit(lambda xx: bn.init(
        jax.random.PRNGKey(0), xx, None, use_running_average=False))(x)
    y, upd = jax.jit(lambda v, xx: bn.apply(
        v, xx, None, use_running_average=False,
        mutable=["batch_stats"]))(vars_, x)
    # Moments over ALL positions (no mask): matches plain normalization.
    ref = (x - x.mean((0, 1))) / np.sqrt(x.var((0, 1)) + 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
