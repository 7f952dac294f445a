"""Native C++ Hungarian solver: build, exactness vs scipy, batch API."""

import numpy as np
import pytest
import scipy.optimize as sopt

from mmmot_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native lap library unavailable (no g++?)")


def test_matches_scipy_min_and_max(rng):
    r = np.random.default_rng(0)
    for n in (1, 2, 7, 32, 64):
        cost = r.normal(0, 10, (n, n))
        rc, obj = native.lap_solve(cost)
        rows, cols = sopt.linear_sum_assignment(cost)
        ref = cost[rows, cols].sum()
        assert obj == pytest.approx(ref, abs=1e-9)
        assert sorted(rc.tolist()) == list(range(n))
        rc2, obj2 = native.lap_solve(cost, maximize=True)
        ref2 = cost[sopt.linear_sum_assignment(cost, maximize=True)].sum()
        assert obj2 == pytest.approx(ref2, abs=1e-9)


def test_batch(rng):
    r = np.random.default_rng(1)
    costs = r.normal(0, 1, (5, 16, 16))
    rc, _ = native.lap_solve(costs)
    assert rc.shape == (5, 16)
    for k in range(5):
        single, _ = native.lap_solve(costs[k])
        obj_b = costs[k][np.arange(16), rc[k]].sum()
        obj_s = costs[k][np.arange(16), single].sum()
        assert obj_b == pytest.approx(obj_s, abs=1e-9)


def test_native_association_matches_ilp(rng):
    import jax.numpy as jnp

    from mmmot_tpu.assoc import solve_ilp_oracle
    from mmmot_tpu.assoc.cost import decisions_objective
    from mmmot_tpu.assoc.ilp_oracle import solve_native_oracle

    r = np.random.default_rng(2)
    N = 10
    for _ in range(8):
        link = r.normal(0, 1, (N, N)).astype(np.float32)
        new = r.normal(0, 1, N).astype(np.float32)
        end = r.normal(0, 1, N).astype(np.float32)
        mp = np.arange(N) < r.integers(0, N + 1)
        mc = np.arange(N) < r.integers(0, N + 1)
        ji = [jnp.asarray(x) for x in (link, new, end, mp, mc)]
        o_ilp = float(decisions_objective(
            solve_ilp_oracle(link, new, end, mp, mc), *ji))
        o_nat = float(decisions_objective(
            solve_native_oracle(link, new, end, mp, mc), *ji))
        assert o_nat == pytest.approx(o_ilp, abs=1e-4)


def test_bad_shape():
    with pytest.raises(ValueError):
        native.lap_solve(np.zeros((3,)))
