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
