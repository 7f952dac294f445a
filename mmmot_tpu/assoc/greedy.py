"""Greedy matching: cheap in-graph baseline and Sinkhorn rounding stage.

Repeatedly takes the globally best remaining (row, col) score and fixes that
pair, masking its row and column — M fixed iterations of argmax, fully
jit/vmap-compatible.  Not exact, but a useful latency floor and the rounding
step for the Sinkhorn plan (where the plan is near-permutation already).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmmot_tpu.assoc.cost import Decisions, build_assignment_cost, decode_assignment

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

    def body(_, state):
        work, assign = state
        idx = jnp.argmax(work)
        i, j = idx // M, idx % M
        assign = assign.at[i].set(j.astype(jnp.int32))
        work = work.at[i, :].set(_BIG_NEG)
        work = work.at[:, j].set(_BIG_NEG)
        return work, assign

    assign0 = jnp.full((M,), -1, jnp.int32)
    _, assign = jax.lax.fori_loop(0, M, body, (score, assign0))
    return assign


def solve_greedy(link, new, end, mask_prev, mask_curr) -> Decisions:
    """Greedy on the gain matrix: accept pairs while the best gain is > 0."""
    from mmmot_tpu.assoc.auction import build_gain_matrix, decode_matching

    gain = build_gain_matrix(link, new, end, mask_prev, mask_curr)
    rc = greedy_matching(gain)
    # Greedy fills every row; drop pairs whose gain is not positive (the
    # outside option end+new is better for those).
    N = gain.shape[-1]
    picked = jnp.take_along_axis(
        gain, jnp.maximum(rc, 0)[..., None], axis=-1)[..., 0]
    rc = jnp.where((rc >= 0) & (picked > 0.0), rc, -1)
    return decode_matching(rc, mask_prev, mask_curr)
