"""Training-time augmentation (reference: utils/build_util.py ->
build_augmentation; the reference composes torchvision-style transforms on
detection crops).

Implemented as pure-JAX functions over padded batches so augmentation runs
on-device inside the jitted train step: horizontal flip (consistent across
both frames of a pair so association labels stay valid), colour jitter
(brightness/contrast/saturation), crop pixel noise, and LiDAR point jitter /
random point dropout.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _uniform(key, shape, lo, hi):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def augment_batch(rng: jax.Array, batch: Dict[str, jnp.ndarray],
                  flip_prob: float = 0.5,
                  brightness: float = 0.2, contrast: float = 0.2,
                  saturation: float = 0.2,
                  point_sigma: float = 0.01,
                  point_drop: float = 0.1) -> Dict[str, jnp.ndarray]:
    """Augment a training batch (crops [B,T,N,h,w,3], points [B,T,N,P,C]).

    Flips and photometric params are drawn per (batch, detection-slot) and
    shared across the T frames of the pair — the same physical object must
    transform identically in both frames or the link labels break.
    """
    out = dict(batch)
    crops = batch.get("crops")
    if crops is not None:
        B, T, N = crops.shape[:3]
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)

        if flip_prob > 0:
            flip = jax.random.bernoulli(k1, flip_prob, (B, 1, N))
            flipped = jnp.flip(crops, axis=-2)
            crops = jnp.where(flip[..., None, None, None], flipped, crops)
        if brightness > 0:
            b = _uniform(k2, (B, 1, N, 1, 1, 1), 1 - brightness,
                         1 + brightness)
            crops = crops * b
        if contrast > 0:
            c = _uniform(k3, (B, 1, N, 1, 1, 1), 1 - contrast, 1 + contrast)
            mean = jnp.mean(crops, axis=(-3, -2, -1), keepdims=True)
            crops = (crops - mean) * c + mean
        if saturation > 0:
            s = _uniform(k4, (B, 1, N, 1, 1, 1), 1 - saturation,
                         1 + saturation)
            gray = jnp.mean(crops, axis=-1, keepdims=True)
            crops = (crops - gray) * s + gray
        out["crops"] = crops
        rng = k5

    points = batch.get("points")
    if points is not None:
        k1, k2 = jax.random.split(rng)
        pts = points
        if point_sigma > 0:
            noise = point_sigma * jax.random.normal(k1, points.shape)
            pts = points.at[..., :3].add(noise[..., :3])
        if "point_mask" in batch and point_drop > 0:
            keep = jax.random.bernoulli(k2, 1 - point_drop,
                                        batch["point_mask"].shape)
            pm = batch["point_mask"] & keep
            # Never drop ALL points of a valid detection.
            any_left = jnp.any(pm, axis=-1, keepdims=True)
            pm = jnp.where(any_left, pm, batch["point_mask"])
            out["point_mask"] = pm
        out["points"] = pts
    return out


def sensor_dropout(rng: jax.Array, batch: Dict[str, jnp.ndarray],
                   image_drop: float = 0.0, lidar_drop: float = 0.0
                   ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray,
                              jnp.ndarray]:
    """Whole-batch sensor dropout for robustness training (the paper trains
    single-modality paths by dropping a sensor).  Returns the batch plus
    (use_image, use_lidar) scalars for branch gating."""
    k1, k2 = jax.random.split(rng)
    drop_img = jax.random.bernoulli(k1, image_drop)
    drop_lid = jax.random.bernoulli(k2, lidar_drop)
    # Never drop both.
    drop_lid = jnp.logical_and(drop_lid, jnp.logical_not(drop_img))
    return batch, jnp.logical_not(drop_img), jnp.logical_not(drop_lid)
