"""Batched auction solver for the association LP — pure JAX.

Replaces the reference's host-side OR-Tools CBC solve (reference:
tracking_model.py ILP; SURVEY.md §3.2) with an in-graph solver that jits,
vmaps and scans, so whole sequences stream through the TPU without per-frame
host round-trips.

Algorithm: **integer** forward auction (Bertsekas) with epsilon scaling on
the square 2Nx2N perfect-matching reduction from ``cost.py`` — Jacobi
variant: every unassigned row bids simultaneously, each contested column
accepts the single highest bid per round.  Costs are quantized onto an
integer grid scaled by ``M + 1`` (the standard integer-auction construction)
and the eps schedule ends at eps = 1, so:

* every arithmetic step is exact in int32 (floating-point auctions stall
  when ``eps`` drops below one ulp of the price magnitude — bids stop
  moving prices and unassigned rows cycle forever; measured at N=64 with
  f32 and eps=1e-6);
* prices rise by >= 1 per accepted bid, so termination is guaranteed;
* the final matching is *provably optimal for the quantized costs*
  (objective within M < M+1 of the scaled optimum implies exact for
  integers).  Quantization resolution is span / 2^quant_bits — far finer
  than bf16 score precision — and the parity suite checks objective
  equality against exact host oracles at KITTI scale (N=64) on random,
  adversarial near-tie, and bf16-quantized instances
  (tests/test_assoc_stress.py).

Note on formulation: the tracking ILP also reduces to a *partial* matching on
``gain[i,j] = link - end_i - new_j`` with outside option 0 (used by the
greedy solver).  Auction with epsilon scaling is NOT sound on that variant —
price warm-starts across phases violate the complementary-slackness
requirement that unmatched columns end at price 0, and rows quit early —
so the exact path pays for the full square reduction instead.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from mmmot_tpu.assoc.cost import (NEG, Decisions, build_assignment_cost,
                                  decode_assignment)

_BIG_NEG = -(2 ** 30)          # forbidden / sentinel for int32 scores


def build_gain_matrix(link, new, end, mask_prev, mask_curr,
                      det_prev=None, det_curr=None):
    """gain[i,j] = link[i,j] - outside_p[i] - outside_c[j]; forbidden -> NEG.

    The tracking objective equals ``sum of matched gains + constant``, so
    any max-weight *partial* matching on this matrix (outside option 0) is an
    exact reformulation.  Without det scores the outside options are end[i]
    and new[j]; with them, linking additionally earns the det scores and the
    outside option is ``max(det + end/new, 0)`` (end-or-reject).  Used by
    greedy; see module docstring for why the scaled auction does not run on
    this form.
    """
    pair_ok = (mask_prev.astype(bool)[..., :, None]
               & mask_curr.astype(bool)[..., None, :])
    if det_prev is not None:
        out_p = jnp.maximum(end + det_prev, 0.0) - det_prev
        out_c = jnp.maximum(new + det_curr, 0.0) - det_curr
    else:
        out_p, out_c = end, new
    gain = link - out_p[..., :, None] - out_c[..., None, :]
    return jnp.where(pair_ok, gain, NEG)


def _auction_all_phases(cost, eps_start, scale_div: int, max_iters,
                        bid_cap):
    """All epsilon-scaling phases in ONE while_loop (int32 arithmetic).

    ``cost`` is int32 (the quantized score matrix).  The carry holds the
    current integer eps; when a phase converges (all rows assigned) the
    loop divides eps by ``scale_div`` (floored at 1), resets the assignment
    and keeps prices (standard warm start).  A single loop instance
    compiles ~4x faster than unrolled per-phase loops on TPU.

    ``bid_cap`` bounds the margin term of each bid (the ``+ eps`` is added
    on top).  A row whose only allowed column makes ``second_v`` the
    _BIG_NEG sentinel would otherwise bid ~2^30; across phase resets those
    mega-bids escalate prices past int32 and wrap around, livelocking the
    final phase (observed at N=64: exactly one row stuck forever).  Capping keeps
    eps-CS intact — the winner's value after a capped bid is *above* the
    ``second - eps`` requirement — and bids stay >= eps, so termination
    and exactness are unaffected.
    """
    M = cost.shape[0]
    one = jnp.int32(1)
    bid_cap = jnp.int32(bid_cap)

    def cond(state):
        assign, owner, prices, eps, it = state
        unfinished = jnp.logical_or(jnp.any(assign < 0), eps > one)
        return jnp.logical_and(unfinished, it < max_iters)

    def phase_done(state):
        assign, owner, prices, eps, it = state
        new_eps = jnp.maximum(eps // scale_div, one)
        assign0 = jnp.full((M,), -1, jnp.int32)
        owner0 = jnp.full((M,), -1, jnp.int32)
        return assign0, owner0, prices, new_eps, it + 1

    def body(state):
        # NOTE: the body is written scatter-free (dense one-hot/argmax
        # updates only).  XLA-TPU compile time blows up (~400s) when
        # scatter-in-loop graphs are fused with large producer networks;
        # the dense form compiles in seconds and is equivalent.
        assign, owner, prices, eps, it = state
        converged = jnp.logical_not(jnp.any(assign < 0))
        active = assign < 0
        v = cost - prices[None, :]                             # [M, M]
        best_j = jnp.argmax(v, axis=1)
        best_v = jnp.max(v, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
        is_best = cols == best_j[:, None]
        second_v = jnp.max(jnp.where(is_best, _BIG_NEG, v), axis=1)
        bid = jnp.minimum(best_v - second_v, bid_cap) + eps

        bids = jnp.where(active[:, None] & is_best, bid[:, None], _BIG_NEG)
        win_bid = jnp.max(bids, axis=0)
        win_row = jnp.argmax(bids, axis=0).astype(jnp.int32)
        contested = win_bid > _BIG_NEG // 2

        prices = jnp.where(contested, prices + win_bid, prices)
        # Row i wins column j iff j is contested and win_row[j] == i.
        won = contested[None, :] & (win_row[None, :] == rows)   # [M, M]
        row_won = jnp.any(won, axis=1)
        new_col = jnp.argmax(won, axis=1).astype(jnp.int32)
        # Row i is displaced iff it owned a contested column it didn't win.
        owned = (owner[None, :] == rows) & contested[None, :]   # [M, M]
        displaced = jnp.any(owned, axis=1) & ~row_won
        assign = jnp.where(row_won, new_col,
                           jnp.where(displaced, -1, assign))
        owner = jnp.where(contested, win_row, owner)
        bidding = (assign, owner, prices, eps, it + 1)
        return jax.lax.cond(converged, phase_done, lambda s: bidding, state)

    assign0 = jnp.full((M,), -1, jnp.int32)
    owner0 = jnp.full((M,), -1, jnp.int32)
    prices0 = jnp.zeros((M,), jnp.int32)
    out = jax.lax.while_loop(
        cond, body, (assign0, owner0, prices0, eps_start, jnp.int32(0)))
    return out[0], out[1], out[2]


def _complete_matching(cost, assign, owner):
    """Greedy completion for rows left unassigned at the iteration cap.

    Rare; keeps the output a valid perfect matching unconditionally.
    """
    M = cost.shape[0]
    ar = jnp.arange(M, dtype=jnp.int32)

    def body(i, carry):
        assign, owner = carry
        need = assign[i] < 0
        vals = jnp.where(owner < 0, cost[i], _BIG_NEG)
        j = jnp.argmax(vals).astype(jnp.int32)
        assign = jnp.where((ar == i) & need, j, assign)
        owner = jnp.where((ar == j) & need, i, owner)
        return assign, owner

    return jax.lax.fori_loop(0, M, body, (assign, owner))


@partial(jax.jit, static_argnames=("scaling_steps", "max_iters",
                                   "quant_bits", "with_info"))
def auction_lap(cost: jnp.ndarray,
                scaling_steps: int = 8, max_iters: int = 100000,
                quant_bits: int = 18, with_info: bool = False):
    """Max-weight perfect matching on square ``cost`` [M, M] (float scores).

    Returns ``row_to_col`` int32 [M] (with ``with_info``, also the number
    of rows left unassigned when the eps-scaling loop stopped — 0 whenever
    the solver converged; the greedy completion only fires otherwise).

    Costs are quantized to ``2^quant_bits`` levels across their span and
    scaled by ``M + 1`` (integer-auction construction): the result is the
    exact optimum of the quantized problem, and quantization error on the
    objective is bounded by ``M * span / 2^quant_bits``.  ``scaling_steps``
    sets how many eps-scaling phases cover the span (division factor is
    derived); the integer schedule always ends at eps = 1 (exact).
    """
    M = cost.shape[0]
    allowed = cost > NEG / 2
    cost = cost.astype(jnp.float32)
    cmax = jnp.max(jnp.where(allowed, cost, -jnp.inf))
    cmin = jnp.min(jnp.where(allowed, cost, jnp.inf))
    span = jnp.maximum(cmax - cmin, 1e-12)
    K = jnp.float32(2 ** quant_bits)
    ci = jnp.round((cost - cmin) / span * K).astype(jnp.int32) * (M + 1)
    ci = jnp.where(allowed, ci, _BIG_NEG)

    # eps schedule: start at scaled-span/4, divide by a factor sized so
    # ~scaling_steps phases reach 1.
    start = (2 ** quant_bits) * (M + 1) // 4
    scale_div = max(2, int(math.ceil(start ** (1.0 / max(scaling_steps,
                                                         1)))))
    # Bid margins never need to exceed the full cost range to see off every
    # competitor (their values differ by at most the span).
    bid_cap = (2 ** quant_bits) * (M + 1)
    assign, owner, prices = _auction_all_phases(
        ci, jnp.int32(start), scale_div, max_iters, bid_cap)
    n_unassigned = jnp.sum((assign < 0).astype(jnp.int32))
    assign, owner = _complete_matching(ci, assign, owner)
    if with_info:
        return assign, n_unassigned
    return assign


def decode_matching(row_to_col, mask_prev, mask_curr, new=None, end=None,
                    det_prev=None, det_curr=None) -> Decisions:
    """Decode a *partial* matching [.., N] (curr col or -1) into Decisions."""
    N = mask_prev.shape[-1]
    mp = mask_prev.astype(bool)
    mc = mask_curr.astype(bool)
    linked = (row_to_col >= 0) & mp
    match_prev = jnp.where(linked, row_to_col, -1).astype(jnp.int32)
    is_end = mp & ~linked

    def invert(mprev, valid):
        idx = jnp.where(valid, mprev, N)
        src = jnp.arange(N, dtype=jnp.int32)
        out = jnp.full((N + 1,), -1, jnp.int32).at[idx].set(
            jnp.where(valid, src, -1), mode="drop")
        return out[:N]

    batch_shape = match_prev.shape[:-1]
    flat = match_prev.reshape((-1, N))
    flatv = linked.reshape((-1, N))
    match_curr = jax.vmap(invert)(flat, flatv).reshape(batch_shape + (N,))
    match_curr = jnp.where(mc, match_curr, -1)
    is_new = mc & (match_curr < 0)
    if det_prev is not None:
        is_end = is_end & ((det_prev + end) >= 0.0)
        is_new = is_new & ((det_curr + new) >= 0.0)
    keep_prev = linked | is_end
    keep_curr = ((match_curr >= 0) | is_new) & mc
    return Decisions(match_prev=match_prev, match_curr=match_curr,
                     is_end=is_end, is_new=is_new,
                     keep_prev=keep_prev, keep_curr=keep_curr)


def solve_auction(link, new, end, mask_prev, mask_curr,
                  scaling_steps: int = 8, max_iters: int = 100000,
                  det_prev=None, det_curr=None) -> Decisions:
    """Full pipeline: scores -> square reduction -> auction -> decisions.

    Supports arbitrary leading batch axes (vmapped internally).
    """
    cost = build_assignment_cost(link, new, end, mask_prev, mask_curr,
                                 det_prev=det_prev, det_curr=det_curr)
    batch_shape = cost.shape[:-2]
    M = cost.shape[-1]
    flat = cost.reshape((-1, M, M))
    solve = jax.vmap(lambda c: auction_lap(c, scaling_steps=scaling_steps,
                                           max_iters=max_iters))
    rc = solve(flat).reshape(batch_shape + (M,))
    return decode_assignment(rc, mask_prev, mask_curr, new=new, end=end,
                             det_prev=det_prev, det_curr=det_curr)
