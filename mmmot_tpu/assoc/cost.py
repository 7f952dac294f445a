"""Exact reduction of the tracking ILP to a square assignment problem.

The reference ILP (reference: tracking_model.py, built over ortools pywraplp;
SURVEY.md §3.2) is, for valid prev dets i and curr dets j:

    maximize   sum_ij link[i,j] y_link[i,j] + sum_j new[j] y_new[j]
                                            + sum_i end[i] y_end[i]
    subject to for all i:  sum_j y_link[i,j] + y_end[i] = 1
               for all j:  sum_i y_link[i,j] + y_new[j] = 1
               y in {0,1}

This is a bipartite perfect-matching polytope with slack nodes, so the ILP's
LP relaxation is integral and the optimum is attained by a **square linear
assignment problem** of size M = N + N over padded slots:

    rows    0..N-1   real prev dets          cols 0..N-1   real curr dets
    rows    N..2N-1  virtual birth sources   cols N..2N-1  virtual death sinks

    C[i, j]     = link[i, j]        i,j real & valid
    C[i, N+i]   = end[i]            prev i matched to its own death sink
    C[N+j, j]   = new[j]            curr j born from its own birth source
    C[N+j, N+i] = 0                 virtual-virtual (always feasible filler)
    everything else = NEG           (forbidden)

A maximum-weight perfect matching of C restricted this way corresponds 1:1 to
a feasible ILP solution with identical objective, and vice versa — so any
exact LAP solver returns the exact ILP optimum.  Invalid (padded) slots are
forced onto their virtual counterpart with score 0, which adds a constant and
never changes the argmax over real decisions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG = -1e5  # forbidden-entry score; finite so auction prices stay NaN-free


class Decisions(NamedTuple):
    """Discrete association decisions over padded slots.

    match_prev: [.., N] int32, index of curr det linked to prev i, or -1.
    match_curr: [.., N] int32, index of prev det linked to curr j, or -1.
    is_end:     [.., N] bool, prev i's track terminates.
    is_new:     [.., N] bool, curr j starts a new track.
    """

    match_prev: jnp.ndarray
    match_curr: jnp.ndarray
    is_end: jnp.ndarray
    is_new: jnp.ndarray


def build_assignment_cost(link, new, end, mask_prev, mask_curr):
    """Build the [.., 2N, 2N] assignment score matrix (maximisation).

    link [.., N, N], new [.., N], end [.., N]; masks are slot validity.
    """
    N = link.shape[-1]
    dt = link.dtype
    mp = mask_prev.astype(bool)
    mc = mask_curr.astype(bool)
    pair_ok = mp[..., :, None] & mc[..., None, :]

    eye = jnp.eye(N, dtype=bool)
    neg = jnp.asarray(NEG, dt)

    # Top-left: real links.
    tl = jnp.where(pair_ok, link, neg)
    # Top-right: prev i -> its own death sink (always allowed; score end[i]
    # for valid slots, 0 for padded slots so they park harmlessly).
    end_diag = jnp.where(mp, end, 0.0)
    tr = jnp.where(eye, end_diag[..., :, None], neg)
    # Bottom-left: birth source j -> curr j.
    new_diag = jnp.where(mc, new, 0.0)
    bl = jnp.where(eye, new_diag[..., None, :], neg)
    # Bottom-right: virtual-virtual filler, all zero (always allowed).
    br = jnp.zeros(link.shape[:-2] + (N, N), dt)

    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, br], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def decode_assignment(row_to_col, mask_prev, mask_curr) -> Decisions:
    """Decode a [.., 2N] perfect-matching (row -> col) into Decisions."""
    N = mask_prev.shape[-1]
    rc = row_to_col
    prev_assign = rc[..., :N]                      # col matched to prev i
    birth_assign = rc[..., N:]                     # col matched to source j

    mp = mask_prev.astype(bool)
    mc = mask_curr.astype(bool)

    linked_prev = (prev_assign < N) & mp
    match_prev = jnp.where(linked_prev, prev_assign, -1).astype(jnp.int32)
    is_end = mp & ~linked_prev

    # Curr j is "new" iff its birth source row N+j matched col j.
    cols = jax.lax.broadcasted_iota(jnp.int32, birth_assign.shape,
                                    birth_assign.ndim - 1)
    is_new = mc & (birth_assign == cols)

    # Invert match_prev -> match_curr via scatter.
    def invert(mprev, valid):
        init = jnp.full((N,), -1, jnp.int32)
        idx = jnp.where(valid, mprev, N)  # dump invalid into overflow slot
        src = jnp.arange(N, dtype=jnp.int32)
        out = jnp.full((N + 1,), -1, jnp.int32).at[idx].set(
            jnp.where(valid, src, -1))
        return out[:N]

    batch_shape = match_prev.shape[:-1]
    flat_mp = match_prev.reshape((-1, N))
    flat_valid = (linked_prev).reshape((-1, N))
    match_curr = jax.vmap(invert)(flat_mp, flat_valid)
    match_curr = match_curr.reshape(batch_shape + (N,))
    match_curr = jnp.where(mc, match_curr, -1)
    return Decisions(match_prev=match_prev, match_curr=match_curr,
                     is_end=is_end, is_new=is_new)


def decisions_objective(dec: Decisions, link, new, end, mask_prev, mask_curr):
    """Objective value of a Decisions pytree under (link, new, end) scores."""
    N = link.shape[-1]
    mp = mask_prev.astype(link.dtype)
    mc = mask_curr.astype(link.dtype)
    onehot = jax.nn.one_hot(jnp.where(dec.match_prev >= 0, dec.match_prev, 0),
                            N, dtype=link.dtype)
    linked = (dec.match_prev >= 0).astype(link.dtype) * mp
    link_term = jnp.sum(onehot * link * linked[..., None], axis=(-2, -1))
    new_term = jnp.sum(jnp.where(dec.is_new, new, 0.0) * mc, axis=-1)
    end_term = jnp.sum(jnp.where(dec.is_end, end, 0.0) * mp, axis=-1)
    return link_term + new_term + end_term
