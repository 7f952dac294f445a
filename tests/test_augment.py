"""Augmentation: label safety (pair-consistent), masking, ranges."""

import jax
import jax.numpy as jnp
import numpy as np

from mmmot_tpu.data.augment import augment_batch, sensor_dropout

B, T, N, P, HW = 2, 2, 4, 8, 16


def _batch(seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "crops": jax.random.normal(k, (B, T, N, HW, HW, 3)),
        "points": jax.random.normal(k, (B, T, N, P, 4)),
        "point_mask": jnp.ones((B, T, N, P), bool),
    }


def test_flip_consistent_across_pair():
    batch = _batch()
    out = jax.jit(lambda r, b: augment_batch(
        r, b, flip_prob=1.0, brightness=0, contrast=0, saturation=0,
        point_sigma=0, point_drop=0))(jax.random.PRNGKey(1), batch)
    # flip applied to every det identically in both frames
    ref = np.flip(np.asarray(batch["crops"]), axis=-2)
    np.testing.assert_allclose(np.asarray(out["crops"]), ref, rtol=1e-6)


def test_no_op_when_disabled():
    batch = _batch()
    out = jax.jit(lambda r, b: augment_batch(
        r, b, flip_prob=0.0, brightness=0, contrast=0, saturation=0,
        point_sigma=0, point_drop=0))(jax.random.PRNGKey(2), batch)
    np.testing.assert_allclose(np.asarray(out["crops"]),
                               np.asarray(batch["crops"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["points"]),
                               np.asarray(batch["points"]), rtol=1e-6)


def test_point_dropout_never_empties_valid_det():
    batch = _batch()
    out = jax.jit(lambda r, b: augment_batch(
        r, b, flip_prob=0, point_sigma=0, point_drop=0.95))(
        jax.random.PRNGKey(3), batch)
    pm = np.asarray(out["point_mask"])
    assert pm.any(axis=-1).all()


def test_sensor_dropout_never_both():
    for seed in range(20):
        _, use_img, use_lid = sensor_dropout(
            jax.random.PRNGKey(seed), {}, image_drop=0.9, lidar_drop=0.9)
        assert bool(use_img) or bool(use_lid)
