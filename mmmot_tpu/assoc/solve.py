"""Solver dispatch: one entry point for all association backends."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from mmmot_tpu.assoc.auction import solve_auction
from mmmot_tpu.assoc.cost import NEG, Decisions
from mmmot_tpu.assoc.greedy import solve_greedy
from mmmot_tpu.assoc.ilp_oracle import (solve_ilp_oracle, solve_lap_oracle,
                                        solve_native_oracle)
from mmmot_tpu.assoc.sinkhorn import solve_sinkhorn
from mmmot_tpu.config import AssocConfig

AssocResult = Decisions

_SOLVERS = ("auction", "sinkhorn", "greedy", "ilp", "lap", "native")


def associate(link, new, end, mask_prev, mask_curr,
              cfg: Optional[AssocConfig] = None,
              det_prev=None, det_curr=None) -> Decisions:
    """Solve one (batched, for in-graph solvers) association instance.

    ``ilp``/``lap`` are host-side exact oracles (single instance, not
    jittable); ``auction``/``sinkhorn``/``greedy`` are pure-JAX.
    ``det_prev``/``det_curr`` are optional per-detection confidence scores
    (log-odds-like) enabling LP-level false-positive rejection (reference
    ILP ``y_det`` variables).
    """
    cfg = cfg or AssocConfig()
    if cfg.link_threshold > 0.0:
        # Links scoring below the threshold are forbidden outright (the
        # solver must then explain those dets via end/new instead), applied
        # uniformly so in-graph solvers and host oracles stay in agreement.
        link = jnp.where(link >= cfg.link_threshold, link,
                         jnp.asarray(NEG, link.dtype))
    det = {"det_prev": det_prev, "det_curr": det_curr}
    s = cfg.solver
    if s == "auction":
        return solve_auction(link, new, end, mask_prev, mask_curr,
                             scaling_steps=cfg.auction_scaling_steps, **det)
    if s == "sinkhorn":
        return solve_sinkhorn(link, new, end, mask_prev, mask_curr,
                              tau=cfg.sinkhorn_tau, iters=cfg.sinkhorn_iters,
                              **det)
    if s == "greedy":
        return solve_greedy(link, new, end, mask_prev, mask_curr, **det)
    if s == "ilp":
        return solve_ilp_oracle(link, new, end, mask_prev, mask_curr, **det)
    if s == "lap":
        return solve_lap_oracle(link, new, end, mask_prev, mask_curr, **det)
    if s == "native":
        return solve_native_oracle(link, new, end, mask_prev, mask_curr,
                                   **det)
    raise ValueError(f"unknown solver {s!r}; expected one of {_SOLVERS}")
