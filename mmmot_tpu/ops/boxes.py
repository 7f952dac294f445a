"""Box geometry ops (jit-friendly, batched).

Used by the optional spatial association gate (``AssocConfig.iou_gate`` /
``iou_weight``) — a TPU-native addition over the reference, whose ILP
scores links purely by learned appearance affinity (reference:
tracking_model.py builds the objective from net scores only).
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of ``a [..., M, 4]`` x ``b [..., N, 4]`` -> [..., M, N].

    Boxes are (l, t, r, b).  Degenerate boxes (zero area, e.g. empty
    slots) yield IoU 0 against everything.
    """
    a = a[..., :, None, :]
    b = b[..., None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


MOTION_FEATURE_DIM = 6


def pair_motion_features(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-pair box-geometry features for the learned motion affinity.

    ``a [..., M, 4]`` x ``b [..., N, 4]`` (l, t, r, b pixel boxes) ->
    ``[..., M, N, 6]`` float32:

        0: dx  — centre x displacement / prev box scale
        1: dy  — centre y displacement / prev box scale
        2: dw  — log(width ratio)
        3: dh  — log(height ratio)
        4: iou — pairwise IoU
        5: dist — centre distance / prev box scale

    The prev box scale is sqrt(w*h) (clamped to 1 px), so the features are
    invariant to image resolution and box size.  Every term is finite for
    degenerate (zero) boxes — empty slots produce garbage-free values that
    the caller's pair mask zeroes out (NaN * 0 would poison masked scores).
    Displacements are clamped to +-20 box scales (an off-screen jump) so
    the MLP never sees unbounded inputs.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)

    def parts(x):
        w = jnp.maximum(x[..., 2] - x[..., 0], 1.0)
        h = jnp.maximum(x[..., 3] - x[..., 1], 1.0)
        cx = 0.5 * (x[..., 0] + x[..., 2])
        cy = 0.5 * (x[..., 1] + x[..., 3])
        return cx, cy, w, h

    acx, acy, aw, ah = parts(a[..., :, None, :])
    bcx, bcy, bw, bh = parts(b[..., None, :, :])
    scale = jnp.sqrt(aw * ah)
    dx = jnp.clip((bcx - acx) / scale, -20.0, 20.0)
    dy = jnp.clip((bcy - acy) / scale, -20.0, 20.0)
    dw = jnp.log(bw / aw)
    dh = jnp.log(bh / ah)
    iou = pairwise_iou(a, b)
    dist = jnp.sqrt(dx * dx + dy * dy)
    return jnp.stack([dx, dy, dw, dh, iou, dist], axis=-1)
