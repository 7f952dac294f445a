"""Torch->flax conversion: numerical parity of converted layers.

Builds small torch modules, converts their weights, and checks the flax
modules produce identical outputs — the machinery needed for weight-level
parity with reference checkpoints (SURVEY.md §7 hard part #2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
from flax import linen as nn

from mmmot_tpu.compat import (convert_bn, convert_conv_weight,
                              convert_linear_weight, torch_to_flax)


def test_conv2d_parity(rng):
    t = tnn.Conv2d(3, 8, 3, padding=1)
    x = np.random.default_rng(0).normal(0, 1, (2, 3, 16, 16)).astype(
        np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    fl = nn.Conv(8, (3, 3), padding="SAME")
    params = {"kernel": jnp.asarray(convert_conv_weight(t.weight)),
              "bias": jnp.asarray(t.bias.detach().numpy())}
    out = fl.apply({"params": params},
                   jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_linear_parity():
    t = tnn.Linear(6, 4)
    x = np.random.default_rng(1).normal(0, 1, (5, 6)).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    fl = nn.Dense(4)
    params = {"kernel": jnp.asarray(convert_linear_weight(t.weight)),
              "bias": jnp.asarray(t.bias.detach().numpy())}
    out = np.asarray(fl.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv1d_as_dense_parity():
    """Reference PointNet conv1d(k=1) == our Dense over channels."""
    t = tnn.Conv1d(4, 16, 1)
    x = np.random.default_rng(2).normal(0, 1, (2, 4, 10)).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()          # [B, 16, P]
    fl = nn.Dense(16)
    params = {"kernel": jnp.asarray(convert_conv_weight(t.weight)),
              "bias": jnp.asarray(t.bias.detach().numpy())}
    out = np.asarray(fl.apply({"params": params},
                              jnp.asarray(np.transpose(x, (0, 2, 1)))))
    np.testing.assert_allclose(np.transpose(out, (0, 2, 1)), ref, atol=1e-5)


def test_bn_parity():
    """Eval-mode BN with converted running stats matches torch."""
    from mmmot_tpu.models.layers import MaskedBatchNorm

    t = tnn.BatchNorm1d(8)
    with torch.no_grad():
        t.weight.mul_(1.7).add_(0.2)
        t.bias.add_(-0.3)
        t.running_mean.add_(torch.arange(8.0) * 0.1)
        t.running_var.mul_(2.0)
    t.eval()
    x = np.random.default_rng(3).normal(0, 1, (6, 8)).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    sd = {f"bn.{k}": v for k, v in t.state_dict().items()}
    p, s = convert_bn("bn", sd)
    bn = MaskedBatchNorm()
    out = np.asarray(bn.apply(
        {"params": {"scale": p["scale"], "bias": p["bias"]},
         "batch_stats": {"mean": s["mean"], "var": s["var"]}},
        jnp.asarray(x), use_running_average=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_torch_to_flax_mapping():
    model = tnn.Sequential(tnn.Conv2d(3, 4, 3), tnn.BatchNorm2d(4),
                           tnn.ReLU())
    sd = {f"net.{k}": v for k, v in model.state_dict().items()}
    sd["head.weight"] = torch.zeros(2, 4)
    sd["head.bias"] = torch.zeros(2)
    sd["orphan.weight"] = torch.zeros(1)
    params, stats, unused = torch_to_flax(sd, {
        "net.0": ("backbone", "conv_0"),
        "net.1": ("backbone", "bn_0"),
        "head": ("head",),
    })
    assert params["backbone"]["conv_0"]["kernel"].shape == (3, 3, 3, 4)
    assert params["head"]["kernel"].shape == (4, 2)
    assert stats["backbone"]["bn_0"]["mean"].shape == (4,)
    assert unused == ["orphan.weight"]
