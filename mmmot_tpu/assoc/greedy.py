"""Greedy matching: cheap in-graph baseline and Sinkhorn rounding stage.

Repeatedly takes the globally best remaining (row, col) score and fixes that
pair, masking its row and column — M fixed iterations of argmax, fully
jit/vmap-compatible.  Not exact, but a useful latency floor and the rounding
step for the Sinkhorn plan (where the plan is near-permutation already).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmmot_tpu.assoc.cost import Decisions

_BIG_NEG = -1e9


@jax.jit
def greedy_matching(score: jnp.ndarray):
    """Greedy perfect matching on [M, M] (or batched [..., M, M]) scores.

    Returns row_to_col int32 [..., M].
    """
    if score.ndim > 2:
        flat = score.reshape((-1,) + score.shape[-2:])
        out = jax.vmap(greedy_matching)(flat)
        return out.reshape(score.shape[:-2] + (score.shape[-1],))

    M = score.shape[0]
    ar = jnp.arange(M, dtype=jnp.int32)

    def body(_, state):
        # Scatter-free (XLA-TPU compiles scatter-in-loop + big producer
        # graphs pathologically slowly; masks + where are equivalent).
        row_used, col_used, assign = state
        masked = jnp.where(row_used[:, None] | col_used[None, :],
                           _BIG_NEG, score)
        idx = jnp.argmax(masked)
        i = (idx // M).astype(jnp.int32)
        j = (idx % M).astype(jnp.int32)
        assign = jnp.where(ar == i, j, assign)
        row_used = row_used | (ar == i)
        col_used = col_used | (ar == j)
        return row_used, col_used, assign

    assign0 = jnp.full((M,), -1, jnp.int32)
    used0 = jnp.zeros((M,), bool)
    _, _, assign = jax.lax.fori_loop(0, M, body, (used0, used0, assign0))
    return assign


def solve_greedy(link, new, end, mask_prev, mask_curr,
                 det_prev=None, det_curr=None) -> Decisions:
    """Greedy on the gain matrix: accept pairs while the best gain is > 0."""
    from mmmot_tpu.assoc.auction import build_gain_matrix, decode_matching

    gain = build_gain_matrix(link, new, end, mask_prev, mask_curr,
                             det_prev=det_prev, det_curr=det_curr)
    rc = greedy_matching(gain)
    # Greedy fills every row; drop pairs whose gain is not positive (the
    # outside option end+new is better for those).
    picked = jnp.take_along_axis(
        gain, jnp.maximum(rc, 0)[..., None], axis=-1)[..., 0]
    rc = jnp.where((rc >= 0) & (picked > 0.0), rc, -1)
    return decode_matching(rc, mask_prev, mask_curr, new=new, end=end,
                           det_prev=det_prev, det_curr=det_curr)
