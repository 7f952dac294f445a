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

**Detection-confidence extension** (reference: tracking_model.py carries
per-detection confidence variables ``y_det`` so the LP itself can reject
false positives; SURVEY.md §2.3/§3.2):

    maximize   ... + sum_i det_prev[i] y_det_p[i] + sum_j det_curr[j] y_det_c[j]
    subject to for all i:  sum_j y_link[i,j] + y_end[i] = y_det_p[i]
               for all j:  sum_i y_link[i,j] + y_new[j] = y_det_c[j]

(a rejected det — ``y_det = 0`` — neither links nor starts/ends a track).
This folds into the SAME square LAP: each prev det occupies exactly one cell,

    C[i, j]     = link[i, j] + det_prev[i] + det_curr[j]
    C[i, N+i]   = max(det_prev[i] + end[i], 0)    ("end" arm vs "reject" arm)
    C[N+j, j]   = max(det_curr[j] + new[j], 0)    ("new" arm vs "reject" arm)

because "end" and "reject" are mutually exclusive per-det options landing on
the same matching cell, the max is exactly the optimiser's choice; decoding
recovers which arm via the sign of ``det + end`` / ``det + new``.  Det scores
should be log-odds-like (negative = likely false positive) for rejection to
have teeth.  The explicit ``y_det`` ILP in ilp_oracle.py independently
verifies this folding (tests/test_assoc.py).
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
    is_end:     [.., N] bool, prev i's track terminates (det accepted).
    is_new:     [.., N] bool, curr j starts a new track (det accepted).
    keep_prev:  [.., N] bool, prev det accepted by the LP (y_det_p = 1).
    keep_curr:  [.., N] bool, curr det accepted by the LP (y_det_c = 1).

    Without detection-confidence scores every valid det is accepted, so
    keep_* == the validity masks and is_end/is_new keep their classic
    "neither linked nor ..." meaning.  With det scores, a rejected det has
    match == -1, is_end/is_new False and keep False.
    """

    match_prev: jnp.ndarray
    match_curr: jnp.ndarray
    is_end: jnp.ndarray
    is_new: jnp.ndarray
    keep_prev: jnp.ndarray = None
    keep_curr: jnp.ndarray = None


def build_assignment_cost(link, new, end, mask_prev, mask_curr,
                          det_prev=None, det_curr=None):
    """Build the [.., 2N, 2N] assignment score matrix (maximisation).

    link [.., N, N], new [.., N], end [.., N]; masks are slot validity.
    ``det_prev``/``det_curr`` [.., N] are optional per-detection confidence
    scores (log-odds-like); when given, the LP may reject detections (see
    module docstring).
    """
    N = link.shape[-1]
    dt = link.dtype
    mp = mask_prev.astype(bool)
    mc = mask_curr.astype(bool)
    pair_ok = mp[..., :, None] & mc[..., None, :]

    eye = jnp.eye(N, dtype=bool)
    neg = jnp.asarray(NEG, dt)

    if det_prev is not None:
        dp = jnp.where(mp, det_prev, 0.0).astype(dt)
        dc = jnp.where(mc, det_curr, 0.0).astype(dt)
        link = link + dp[..., :, None] + dc[..., None, :]
        end = jnp.maximum(end + dp, 0.0)
        new = jnp.maximum(new + dc, 0.0)

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


def decode_assignment(row_to_col, mask_prev, mask_curr, new=None, end=None,
                      det_prev=None, det_curr=None) -> Decisions:
    """Decode a [.., 2N] perfect-matching (row -> col) into Decisions.

    With det scores, a det parked on its virtual counterpart is "end"/"new"
    only when that arm beat the reject arm (``det + end/new >= 0``).
    """
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

    if det_prev is not None:
        accept_end = (det_prev + end) >= 0.0
        accept_new = (det_curr + new) >= 0.0
        is_end = is_end & accept_end
        is_new = is_new & accept_new

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
    keep_prev = linked_prev | is_end
    keep_curr = ((match_curr >= 0) | is_new) & mc
    return Decisions(match_prev=match_prev, match_curr=match_curr,
                     is_end=is_end, is_new=is_new,
                     keep_prev=keep_prev, keep_curr=keep_curr)


def decisions_objective(dec: Decisions, link, new, end, mask_prev, mask_curr,
                        det_prev=None, det_curr=None):
    """Objective value of a Decisions pytree under the LP scores."""
    N = link.shape[-1]
    mp = mask_prev.astype(link.dtype)
    mc = mask_curr.astype(link.dtype)
    onehot = jax.nn.one_hot(jnp.where(dec.match_prev >= 0, dec.match_prev, 0),
                            N, dtype=link.dtype)
    linked = (dec.match_prev >= 0).astype(link.dtype) * mp
    link_term = jnp.sum(onehot * link * linked[..., None], axis=(-2, -1))
    new_term = jnp.sum(jnp.where(dec.is_new, new, 0.0) * mc, axis=-1)
    end_term = jnp.sum(jnp.where(dec.is_end, end, 0.0) * mp, axis=-1)
    obj = link_term + new_term + end_term
    if det_prev is not None:
        kp = dec.keep_prev if dec.keep_prev is not None else \
            (dec.match_prev >= 0) | dec.is_end
        kc = dec.keep_curr if dec.keep_curr is not None else \
            (dec.match_curr >= 0) | dec.is_new
        obj = obj + jnp.sum(jnp.where(kp, det_prev, 0.0) * mp, axis=-1)
        obj = obj + jnp.sum(jnp.where(kc, det_curr, 0.0) * mc, axis=-1)
    return obj
