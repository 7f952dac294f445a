"""Full-branch weight-conversion parity: torch twin -> converted weights ->
flax module must reproduce the torch outputs (eval mode).

This is the end-to-end version of the per-layer checks in test_compat.py —
it exercises conv stacking order, BN folding of running stats, pooling
semantics and the layer-name mapping machinery at once (SURVEY.md §7 hard
part #2: the converter + golden-fixture harness for weight-level parity).
"""

import numpy as np
import pytest
import torch

from mmmot_tpu.compat import torch_to_flax

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mmmot_tpu.config import AppearanceConfig, PointConfig  # noqa: E402
from mmmot_tpu.models.appearance import AppearanceNet  # noqa: E402
from mmmot_tpu.models.pointnet import PointNet  # noqa: E402

from tests.torch_oracle import (TorchPointNet, TorchVGGSkipPool,  # noqa: E402
                                pointnet_mapping, vgg_mapping)


def _randomize_bn(model, rng):
    """Give BN layers non-trivial running stats so parity is meaningful."""
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.add_(torch.from_numpy(
                    rng.normal(0, 0.3, m.running_mean.shape).astype(
                        np.float32)))
                m.running_var.mul_(torch.from_numpy(
                    rng.uniform(0.5, 2.0, m.running_var.shape).astype(
                        np.float32)))
                m.weight.mul_(torch.from_numpy(
                    rng.uniform(0.8, 1.2, m.weight.shape).astype(
                        np.float32)))


def test_vgg_branch_parity():
    rng = np.random.default_rng(0)
    tmodel = TorchVGGSkipPool(depth=11, width_mult=0.125, reduction_dim=16,
                              out_dim=32)
    _randomize_bn(tmodel, rng)
    tmodel.eval()
    B, HW = 3, 32
    x = rng.normal(0, 1, (B, 3, HW, HW)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    sd = tmodel.state_dict()
    params, stats, unused = torch_to_flax(sd, vgg_mapping(11))
    assert not unused, unused

    cfg = AppearanceConfig(depth=11, crop_size=(HW, HW), reduction_dim=16,
                           out_dim=32, width_mult=0.125)
    net = AppearanceNet(cfg=cfg)
    out = net.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


def test_pointnet_branch_parity():
    rng = np.random.default_rng(1)
    tmodel = TorchPointNet(in_dim=4, channels=(16, 32), out_dim=32)
    _randomize_bn(tmodel, rng)
    tmodel.eval()
    B, P = 3, 16
    pts = rng.normal(0, 1, (B, P, 4)).astype(np.float32)
    mask = rng.random((B, P)) > 0.3
    mask[:, 0] = True
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(pts),
                     torch.from_numpy(mask)).numpy()

    params, stats, unused = torch_to_flax(tmodel.state_dict(),
                                          pointnet_mapping(2))
    assert not unused, unused
    net = PointNet(cfg=PointConfig(point_len=P, channels=(16, 32),
                                   out_dim=32))
    out = net.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(pts), jnp.asarray(mask), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)
