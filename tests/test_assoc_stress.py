"""Exact-solver stress proof at KITTI scale (VERDICT r1 item 4).

KITTI frames reach ~60 detections (SURVEY.md §4), and near-tie / bf16
score matrices are the dangerous regime for epsilon-scaling termination.
The heavy sweep — 1024 instances at N=64 across random / adversarial-tie /
bf16-quantized / det-confidence regimes, integer auction vs the native C++
Hungarian oracle — runs in a clean single-device subprocess (see
assoc_stress_runner.py for why), asserting:

* objective equality to 1e-6 in float64 evaluation;
* `_complete_matching` never fires (the eps-scaling loop itself converges).

A degenerate all-ties instance additionally runs in-process.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

RUNNER = os.path.join(os.path.dirname(__file__), "assoc_stress_runner.py")


def test_stress_sweep_exact_and_convergent():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(RUNNER)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, RUNNER], capture_output=True,
                         text=True, timeout=540, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["n_instances"] >= 1024
    for kind in ("rand", "ties", "bf16", "det"):
        assert report[f"max_gap_{kind}"] <= 1e-6, report
    for kind in ("rand", "ties", "bf16"):
        assert report[f"max_unassigned_{kind}"] == 0, report


def test_adversarial_identical_scores():
    """Fully degenerate instance: every option identical — still valid."""
    from mmmot_tpu.assoc import solve_auction

    N = 64
    full = jnp.ones(N, bool)
    link = jnp.zeros((N, N))
    new = jnp.zeros(N)
    end = jnp.zeros(N)
    dec = jax.jit(solve_auction)(link, new, end, full, full)
    mprev = np.asarray(dec.match_prev)
    linked = mprev[mprev >= 0]
    assert len(set(linked.tolist())) == len(linked)
    # Any perfect structure is optimal here (objective exactly 0).
    assert not np.asarray(dec.is_end)[mprev >= 0].any()
