"""Loss-layer checks: masking, gradient flow, label consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.data.synthetic import association_labels, make_training_batch
from mmmot_tpu.train.losses import tracking_loss

B, T, N = 2, 2, 6


def _outputs(rng, det=True):
    k = jax.random.PRNGKey(rng)
    out = {
        "link": jax.random.normal(k, (B, T - 1, N, N)),
        "new": jax.random.normal(k, (B, T - 1, N)),
        "end": jax.random.normal(k, (B, T - 1, N)),
    }
    if det:
        out["det"] = jax.random.normal(k, (B, T, N))
    return out


def _batch(rng):
    r = np.random.default_rng(rng)
    counts = r.integers(1, N + 1, (B, T))
    det_mask = np.arange(N)[None, None, :] < counts[..., None]
    gt_ids = np.stack([np.stack([r.permutation(2 * N)[:N]
                                 for _ in range(T)]) for _ in range(B)])
    gt_ids = np.where(det_mask, gt_ids, -1)
    lab = association_labels(gt_ids[:, 0], gt_ids[:, 1],
                             det_mask[:, 0], det_mask[:, 1])
    return {
        "det_mask": jnp.asarray(det_mask),
        "gt_ids": jnp.asarray(gt_ids.astype(np.int32)),
        "gt_link": jnp.asarray(lab["link"][:, None]),
        "gt_new": jnp.asarray(lab["new"][:, None]),
        "gt_end": jnp.asarray(lab["end"][:, None]),
    }


def test_loss_finite_and_positive():
    loss, metrics = jax.jit(tracking_loss)(_outputs(0), _batch(0))
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k in ("ce_prev", "ce_curr", "bce_new", "bce_end", "bce_det"):
        assert np.isfinite(float(metrics[k]))


def test_loss_ignores_padded_slots():
    """Changing scores on padded slots must not change the loss."""
    out1 = _outputs(1)
    batch = _batch(1)
    dm = np.asarray(batch["det_mask"])
    pad_pair = ~(dm[:, :-1][..., :, None] & dm[:, 1:][..., None, :])
    out2 = dict(out1)
    out2["link"] = out1["link"] + 37.0 * pad_pair
    out2["new"] = out1["new"] - 11.0 * ~dm[:, 1:]
    out2["end"] = out1["end"] + 5.0 * ~dm[:, :-1]
    out2["det"] = out1["det"] + 3.0 * ~dm
    l1, _ = jax.jit(tracking_loss)(out1, batch)
    l2, _ = jax.jit(tracking_loss)(out2, batch)
    assert abs(float(l1) - float(l2)) < 1e-5


def test_perfect_scores_give_low_ce():
    batch = _batch(2)
    big = 50.0
    out = {
        "link": big * batch["gt_link"] - big * (1 - batch["gt_link"]),
        "new": big * batch["gt_new"] - big * (1 - batch["gt_new"]),
        "end": big * batch["gt_end"] - big * (1 - batch["gt_end"]),
    }
    loss, m = jax.jit(tracking_loss)(out, batch)
    assert float(m["ce_prev"]) < 1e-3
    assert float(m["ce_curr"]) < 1e-3


def test_gradients_flow():
    out = _outputs(3)
    batch = _batch(3)

    def f(out):
        return tracking_loss(out, batch)[0]

    grads = jax.jit(jax.grad(f))(out)
    total = sum(float(jnp.abs(g).sum()) for g in grads.values())
    assert total > 0
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k


def test_association_labels_consistency(rng):
    b = make_training_batch(np.random.default_rng(4), batch_size=3,
                            num_slots=N, drop_prob=0.2, fp_prob=0.3)
    link, new, end = b["gt_link"][:, 0], b["gt_new"][:, 0], b["gt_end"][:, 0]
    mask_prev, mask_curr = b["det_mask"][:, 0], b["det_mask"][:, 1]
    # Every valid prev det either links (row sum 1) or ends.
    rows = link.sum(-1)
    np.testing.assert_array_equal((rows + end)[mask_prev],
                                  np.ones(mask_prev.sum()))
    cols = link.sum(-2)
    np.testing.assert_array_equal((cols + new)[mask_curr],
                                  np.ones(mask_curr.sum()))
    # Padding carries no labels.
    assert link[~(mask_prev[..., :, None] & mask_curr[..., None, :])].sum() == 0


def test_compact_training_matches_plain():
    """compact_capacity training forward == plain forward (loss + grads)."""
    import numpy as np

    from mmmot_tpu.config import (AffinityConfig, AppearanceConfig,
                                  FusionConfig, ModelConfig, NewEndConfig,
                                  PointConfig, TrainConfig)
    from mmmot_tpu.data.synthetic import make_training_batch
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.train import create_train_state, train_step

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
    rng = np.random.default_rng(0)
    b = make_training_batch(rng, batch_size=2, num_slots=6,
                            crop_size=(32, 32), points_per_det=8,
                            drop_prob=0.2, fp_prob=0.2)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    n_valid = int(np.asarray(batch["det_mask"]).sum())

    state = create_train_state(net, TrainConfig(warmup_steps=0),
                               jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    plain_state, plain_m = jax.jit(
        lambda s, bb, r: train_step(net, s, bb, r))(state, batch, key)
    comp_state, comp_m = jax.jit(
        lambda s, bb, r: train_step(net, s, bb, r,
                                    compact_capacity=n_valid + 2))(
        state, batch, key)

    assert float(plain_m["total"]) == pytest.approx(
        float(comp_m["total"]), rel=1e-6)
    # BN batch statistics agree to float noise; updated params agree to
    # ~2*lr — Adam normalises near-zero gradients to +-lr, so f32
    # summation-order noise through the gather/scatter can flip their
    # sign (the loss itself is bit-identical above).
    for a, b2 in zip(jax.tree.leaves(plain_state.params),
                     jax.tree.leaves(comp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=1e-3)
    for a, b2 in zip(jax.tree.leaves(plain_state.batch_stats),
                     jax.tree.leaves(comp_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=1e-5)

    # Under-capacity drops are masked from the loss, not silently kept.
    small_state, small_m = jax.jit(
        lambda s, bb, r: train_step(net, s, bb, r, compact_capacity=4))(
        state, batch, key)
    assert np.isfinite(float(small_m["total"]))
