"""Host-side exact solvers: the parity oracles.

Two independent exact formulations of the reference association problem
(reference: tracking_model.py ILP over ortools pywraplp / CBC):

* :func:`solve_ilp_oracle` — the ILP written exactly as the reference writes
  it (binary y_link/y_new/y_end, per-detection flow-conservation equalities),
  solved with ``scipy.optimize.milp`` (HiGHS).  This is the ground truth.
* :func:`solve_lap_oracle` — ``scipy.optimize.linear_sum_assignment`` on the
  square assignment reduction from ``cost.py``.  Agreement between the two on
  random instances proves the reduction is exact (tests/test_assoc_parity.py).

Both run on host numpy and exist for testing and as a reference-faithful
fallback path; the production tracker uses the in-graph solvers.
"""

from __future__ import annotations

import numpy as np
import scipy.optimize as sopt
import scipy.sparse as sp

from mmmot_tpu.assoc.cost import Decisions, build_assignment_cost, decode_assignment


def _decode_kwargs(new, end, det_prev, det_curr):
    import jax.numpy as jnp
    if det_prev is None:
        return {}
    return {"new": jnp.asarray(new), "end": jnp.asarray(end),
            "det_prev": jnp.asarray(det_prev),
            "det_curr": jnp.asarray(det_curr)}


def solve_lap_oracle(link, new, end, mask_prev, mask_curr,
                     det_prev=None, det_curr=None) -> Decisions:
    """Exact: Hungarian (JV) on the 2Nx2N assignment reduction."""
    cost = np.asarray(build_assignment_cost(link, new, end, mask_prev,
                                            mask_curr, det_prev=det_prev,
                                            det_curr=det_curr))
    if cost.ndim != 2:
        raise ValueError("oracle solves one instance at a time")
    row, col = sopt.linear_sum_assignment(cost, maximize=True)
    rc = np.empty(cost.shape[0], np.int32)
    rc[row] = col.astype(np.int32)
    import jax.numpy as jnp
    return decode_assignment(jnp.asarray(rc), jnp.asarray(mask_prev),
                             jnp.asarray(mask_curr),
                             **_decode_kwargs(new, end, det_prev, det_curr))


def solve_native_oracle(link, new, end, mask_prev, mask_curr,
                        det_prev=None, det_curr=None) -> Decisions:
    """Exact: the framework's C++ Hungarian solver (mmmot_tpu/native).

    Same reduction as :func:`solve_lap_oracle`; the native solver is the
    fast host path (and supports batches).  Raises if the native library
    cannot be built.
    """
    from mmmot_tpu import native

    cost = np.asarray(build_assignment_cost(link, new, end, mask_prev,
                                            mask_curr, det_prev=det_prev,
                                            det_curr=det_curr))
    import jax.numpy as jnp
    kw = _decode_kwargs(new, end, det_prev, det_curr)
    if cost.ndim == 2:
        rc, _ = native.lap_solve(cost, maximize=True)
        return decode_assignment(jnp.asarray(rc), jnp.asarray(mask_prev),
                                 jnp.asarray(mask_curr), **kw)
    lead = cost.shape[:-2]
    rc, _ = native.lap_solve(cost.reshape((-1,) + cost.shape[-2:]),
                             maximize=True)
    return decode_assignment(jnp.asarray(rc.reshape(lead + rc.shape[-1:])),
                             jnp.asarray(mask_prev), jnp.asarray(mask_curr),
                             **kw)


def solve_ilp_oracle(link, new, end, mask_prev, mask_curr,
                     det_prev=None, det_curr=None) -> Decisions:
    """Exact: the reference-shaped binary ILP via scipy.optimize.milp.

    Variables (valid slots only): y_link[i,j], y_end[i], y_new[j], and —
    when det scores are given — per-detection confidence variables
    y_det_p[i], y_det_c[j] (reference: tracking_model.py ILP with detection
    variables; SURVEY.md §2.3/§3.2 ``y_det`` [VERIFY]).

    Constraints: sum_j y_link[i,j] + y_end[i] = y_det_p[i]  (or = 1);
                 sum_i y_link[i,j] + y_new[j] = y_det_c[j]  (or = 1).
    Objective:   maximize sum link*y_link + sum new*y_new + sum end*y_end
                 [+ sum det_prev*y_det_p + sum det_curr*y_det_c].
    """
    link = np.asarray(link, np.float64)
    new = np.asarray(new, np.float64)
    end = np.asarray(end, np.float64)
    mp = np.asarray(mask_prev, bool)
    mc = np.asarray(mask_curr, bool)
    use_det = det_prev is not None
    if use_det:
        det_prev = np.asarray(det_prev, np.float64)
        det_curr = np.asarray(det_curr, np.float64)
    N = link.shape[-1]
    pi = np.flatnonzero(mp)          # valid prev indices
    ci = np.flatnonzero(mc)          # valid curr indices
    npv, ncv = len(pi), len(ci)

    # Variable layout: [y_link (npv*ncv), y_end (npv), y_new (ncv),
    #                   (use_det) y_det_p (npv), y_det_c (ncv)]
    n_link = npv * ncv
    n_base = n_link + npv + ncv
    n_var = n_base + (npv + ncv if use_det else 0)
    parts = [
        -link[np.ix_(pi, ci)].ravel(),   # milp minimises -> negate
        -end[pi],
        -new[ci],
    ]
    if use_det:
        parts += [-det_prev[pi], -det_curr[ci]]
    c = np.concatenate(parts) if n_var else np.zeros(0)

    rows, cols, vals = [], [], []
    # Prev constraints: sum_j y_link + y_end [- y_det_p] = [1 | 0].
    for a in range(npv):
        for b in range(ncv):
            rows.append(a); cols.append(a * ncv + b); vals.append(1.0)
        rows.append(a); cols.append(n_link + a); vals.append(1.0)
        if use_det:
            rows.append(a); cols.append(n_base + a); vals.append(-1.0)
    # Curr constraints: sum_i y_link + y_new [- y_det_c] = [1 | 0].
    for b in range(ncv):
        for a in range(npv):
            rows.append(npv + b); cols.append(a * ncv + b); vals.append(1.0)
        rows.append(npv + b); cols.append(n_link + npv + b); vals.append(1.0)
        if use_det:
            rows.append(npv + b); cols.append(n_base + npv + b)
            vals.append(-1.0)

    match_prev = np.full(N, -1, np.int32)
    is_end = np.zeros(N, bool)
    is_new = np.zeros(N, bool)
    keep_prev = np.zeros(N, bool)
    keep_curr = np.zeros(N, bool)

    if n_var:
        A = sp.csr_matrix((vals, (rows, cols)), shape=(npv + ncv, n_var))
        rhs = np.zeros(npv + ncv) if use_det else np.ones(npv + ncv)
        res = sopt.milp(
            c=c,
            constraints=sopt.LinearConstraint(A, rhs, rhs),
            integrality=np.ones(n_var),
            bounds=sopt.Bounds(0, 1),
        )
        if not res.success:
            raise RuntimeError(f"ILP oracle failed: {res.message}")
        y = np.round(res.x).astype(int)
        y_link = y[:n_link].reshape(npv, ncv)
        y_end = y[n_link:n_link + npv]
        y_new = y[n_link + npv:n_base]
        for a in range(npv):
            if y_end[a]:
                is_end[pi[a]] = True
            elif y_link[a].any():
                match_prev[pi[a]] = ci[np.argmax(y_link[a])]
        for b in range(ncv):
            if y_new[b]:
                is_new[ci[b]] = True
        if use_det:
            keep_prev[pi] = y[n_base:n_base + npv].astype(bool)
            keep_curr[ci] = y[n_base + npv:].astype(bool)
        else:
            keep_prev[pi] = True
            keep_curr[ci] = True

    match_curr = np.full(N, -1, np.int32)
    for i in range(N):
        if match_prev[i] >= 0:
            match_curr[match_prev[i]] = i
    import jax.numpy as jnp
    return Decisions(match_prev=jnp.asarray(match_prev),
                     match_curr=jnp.asarray(match_curr),
                     is_end=jnp.asarray(is_end),
                     is_new=jnp.asarray(is_new),
                     keep_prev=jnp.asarray(keep_prev),
                     keep_curr=jnp.asarray(keep_curr))
