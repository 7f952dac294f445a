"""Masked primitives for padded detection slots.

Everything downstream of the data packer runs on fixed-shape arrays with a
boolean validity mask over detection slots (SURVEY.md §7 "hard parts" #3:
mask-correctness everywhere, because off-by-one masking shows up as silent
MOTA drift).  These helpers centralise the masking conventions:

* masks are boolean, ``True`` = valid slot;
* reductions over fully-masked axes return a well-defined neutral value
  (0 for mean/softmax, ``fill`` for max) instead of NaN/-inf garbage;
* ``NEG_INF`` is a large finite negative, not ``-jnp.inf``, so that masked
  softmax stays NaN-free under bf16 and XLA constant folding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def pad_to(x: jnp.ndarray, size: int, axis: int = 0, fill=0):
    """Pad ``x`` along ``axis`` up to ``size`` with ``fill`` (static shapes)."""
    cur = x.shape[axis]
    if cur == size:
        return x
    if cur > size:
        raise ValueError(f"cannot pad axis {axis} of length {cur} down to {size}")
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, size - cur)
    return jnp.pad(x, pads, constant_values=fill)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis, keepdims: bool = False,
               fill: float = 0.0):
    """Max over ``axis`` counting only ``mask``-valid entries.

    ``mask`` broadcasts against ``x``.  Slots where *no* entry is valid
    produce ``fill`` (the reference's PointNet max-pool over an empty point
    set yields zeros because padded points are zeroed; we make that explicit).
    """
    neg = jnp.where(mask, x, NEG_INF)
    m = jnp.max(neg, axis=axis, keepdims=keepdims)
    any_valid = jnp.any(mask, axis=axis, keepdims=keepdims)
    return jnp.where(any_valid, m, fill)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis, keepdims: bool = False):
    mask_f = mask.astype(x.dtype)
    num = jnp.sum(x * mask_f, axis=axis, keepdims=keepdims)
    den = jnp.sum(mask_f, axis=axis, keepdims=keepdims)
    return num / jnp.maximum(den, 1.0)


def masked_softmax(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1):
    """Softmax over ``axis`` with invalid entries given zero probability.

    Fully-masked rows return all-zero probabilities (not uniform), so that
    downstream expectations over invalid rows vanish.
    """
    logits = jnp.where(mask, x, NEG_INF)
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=axis, keepdims=True))
    unnorm = jnp.exp(logits) * mask.astype(x.dtype)
    den = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(den, 1e-30)


def masked_log_softmax(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1):
    logits = jnp.where(mask, x, NEG_INF)
    shifted = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=axis, keepdims=True))
    unnorm = jnp.where(mask, jnp.exp(shifted), 0.0)
    lse = jnp.log(jnp.maximum(jnp.sum(unnorm, axis=axis, keepdims=True), 1e-30))
    return jnp.where(mask, shifted - lse, NEG_INF)


def pair_mask(mask_a: jnp.ndarray, mask_b: jnp.ndarray):
    """Outer product of two slot masks -> [..., Na, Nb] pair validity."""
    return mask_a[..., :, None] & mask_b[..., None, :]


def compact_indices(flat_mask: jnp.ndarray, capacity: int):
    """Valid-first stable ordering of a flat boolean slot mask.

    The core of the compact-first pipelines (inference AND training):
    returns (idx [capacity] int32 — flat indices with valid slots first in
    original order; taken [capacity] bool — whether idx[k] is valid).
    ``capacity`` is clamped to the slot count.
    """
    total = flat_mask.shape[0]
    capacity = min(capacity, total)
    order_score = flat_mask.astype(jnp.int32) * (total + 1) - \
        jax.lax.broadcasted_iota(jnp.int32, (total, 1), 0)[:, 0]
    _, idx = jax.lax.top_k(order_score, capacity)
    taken = flat_mask[idx]
    return idx.astype(jnp.int32), taken


def scatter_compact(values: jnp.ndarray, idx: jnp.ndarray,
                    taken: jnp.ndarray, total: int):
    """Scatter compacted [capacity, D] rows back to flat [total, D].

    Invalid rows are zeroed before the scatter so padding slots hold zeros
    (gradients flow through the gather/scatter pair, so this is usable in
    training too).
    """
    v = values * taken[:, None].astype(values.dtype)
    return jnp.zeros((total, values.shape[-1]), values.dtype).at[idx].set(v)
