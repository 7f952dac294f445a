"""Standalone runner for the KITTI-scale solver stress proof.

Executed by tests/test_assoc_stress.py in a SUBPROCESS with a clean
single-device CPU backend: the test suite's 8-virtual-device conftest
slows single-instance while_loops ~30x, which would blow the CI budget at
the mandated scale (1024 instances, N=64).  Run directly for a report:

    python tests/assoc_stress_runner.py
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402

N = 64
B = 256          # per regime; 3 regimes + det-scores = 1024 instances


def np_objective(dec, link, new, end, mp, mc, det_p=None, det_c=None):
    """float64 objective of batched Decisions (numpy, vectorised)."""
    link = np.asarray(link, np.float64)
    new = np.asarray(new, np.float64)
    end = np.asarray(end, np.float64)
    mprev = np.asarray(dec.match_prev)
    is_new = np.asarray(dec.is_new) & np.asarray(mc)
    is_end = np.asarray(dec.is_end) & np.asarray(mp)
    linked = (mprev >= 0) & np.asarray(mp)
    picked = np.take_along_axis(link, np.maximum(mprev, 0)[..., None],
                                axis=-1)[..., 0]
    obj = (picked * linked).sum(-1) + (new * is_new).sum(-1) \
        + (end * is_end).sum(-1)
    if det_p is not None:
        kp = np.asarray(dec.keep_prev) & np.asarray(mp)
        kc = np.asarray(dec.keep_curr) & np.asarray(mc)
        obj = obj + (np.asarray(det_p, np.float64) * kp).sum(-1) \
            + (np.asarray(det_c, np.float64) * kc).sum(-1)
    return obj


def make_instances(kind, batch=B, seed=0):
    rng = np.random.default_rng(
        {"rand": 1, "ties": 2, "bf16": 3}.get(kind, 4) * 1000 + seed)
    link = rng.normal(0, 1, (batch, N, N)).astype(np.float32)
    if kind == "ties":
        link = np.round(link * 2) / 2      # coarse grid -> massive ties
    elif kind == "bf16":
        link = np.asarray(
            jnp.asarray(link, jnp.bfloat16).astype(jnp.float32))
    new = rng.uniform(0, 1, (batch, N)).astype(np.float32)
    end = rng.uniform(0, 1, (batch, N)).astype(np.float32)
    mp = np.arange(N)[None] < rng.integers(0, N + 1, (batch, 1))
    mc = np.arange(N)[None] < rng.integers(0, N + 1, (batch, 1))
    return link, new, end, mp, mc


def main():
    from mmmot_tpu.assoc import solve_auction
    from mmmot_tpu.assoc.auction import auction_lap
    from mmmot_tpu.assoc.cost import build_assignment_cost
    from mmmot_tpu.assoc.ilp_oracle import solve_native_oracle

    jsolve = jax.jit(solve_auction)
    jsolve_det = jax.jit(lambda l, n, e, p, c, dp, dc: solve_auction(
        l, n, e, p, c, det_prev=dp, det_curr=dc))
    report = {"n_instances": 0}

    # Objective parity, three score regimes.
    for kind in ("rand", "ties", "bf16"):
        inst = make_instances(kind)
        ji = [jnp.asarray(x) for x in inst]
        dec = jsolve(*ji)
        gap = np_objective(solve_native_oracle(*inst), *inst) \
            - np_objective(dec, *inst)
        report[f"max_gap_{kind}"] = float(np.abs(gap).max())
        report["n_instances"] += B

        # Convergence property: completion never fires.
        cost = build_assignment_cost(*ji)
        _, un = jax.jit(jax.vmap(
            lambda c: auction_lap(c, with_info=True)))(cost)
        report[f"max_unassigned_{kind}"] = int(np.asarray(un).max())

    # Det-confidence instances.
    inst = make_instances("rand", seed=7)
    rng = np.random.default_rng(99)
    det_p = rng.normal(0, 1.5, (B, N)).astype(np.float32)
    det_c = rng.normal(0, 1.5, (B, N)).astype(np.float32)
    ji = [jnp.asarray(x) for x in inst]
    dec = jsolve_det(*ji, jnp.asarray(det_p), jnp.asarray(det_c))
    gap = np_objective(
        solve_native_oracle(*inst, det_prev=det_p, det_curr=det_c),
        *inst, det_p=det_p, det_c=det_c) \
        - np_objective(dec, *inst, det_p=det_p, det_c=det_c)
    report["max_gap_det"] = float(np.abs(gap).max())
    report["n_instances"] += B

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    r = main()
    bad = [k for k, v in r.items()
           if (k.startswith("max_gap") and v > 1e-6)
           or (k.startswith("max_unassigned") and v > 0)]
    sys.exit(1 if bad else 0)
