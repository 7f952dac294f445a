"""Torch twin modules for cross-framework numerical parity tests.

These re-express *this framework's* architecture in PyTorch (CPU) so that
converted weights can be checked end-to-end: flax module + converted torch
weights must reproduce the torch module's outputs.  This is the
weight-parity harness SURVEY.md §7 step 5 calls for — the same machinery
that validates reference-checkpoint conversions when real checkpoints are
available.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from mmmot_tpu.models.appearance import VGG_PLANS


class TorchVGGSkipPool(nn.Module):
    """Twin of mmmot_tpu.models.appearance.AppearanceNet (eval mode)."""

    def __init__(self, depth=11, width_mult=0.125, reduction_dim=16,
                 out_dim=32, in_ch=3):
        super().__init__()
        self.convs = nn.ModuleList()
        self.bns = nn.ModuleList()
        self.plan = VGG_PLANS[depth]
        ch = in_ch
        for item in self.plan:
            if item == "M":
                continue
            oc = max(8, int(item * width_mult))
            self.convs.append(nn.Conv2d(ch, oc, 3, padding=1))
            self.bns.append(nn.BatchNorm2d(oc))
            ch = oc
        # skip pooling over last 3 stages
        self.reduces = nn.ModuleList()
        self.reduce_bns = nn.ModuleList()
        stage_channels = []
        c = in_ch
        for item in self.plan:
            if item == "M":
                stage_channels.append(c)
            else:
                c = max(8, int(item * width_mult))
        for sc in stage_channels[-3:]:
            self.reduces.append(nn.Linear(sc, reduction_dim))
            self.reduce_bns.append(nn.BatchNorm1d(reduction_dim))
        self.proj = nn.Linear(3 * reduction_dim, out_dim)

    def forward(self, x):  # x [B, 3, H, W]
        stages = []
        ci = 0
        for item in self.plan:
            if item == "M":
                x = F.max_pool2d(x, 2, 2)
                stages.append(x)
            else:
                x = F.relu(self.bns[ci](self.convs[ci](x)))
                ci += 1
        pooled = []
        for k, s in enumerate(stages[-3:]):
            p = torch.amax(s, dim=(2, 3))            # global max pool
            p = F.relu(self.reduce_bns[k](self.reduces[k](p)))
            pooled.append(p)
        return self.proj(torch.cat(pooled, dim=1))


class TorchPointNet(nn.Module):
    """Twin of mmmot_tpu.models.pointnet.PointNet (eval, no T-Net)."""

    def __init__(self, in_dim=4, channels=(16, 32), out_dim=32):
        super().__init__()
        self.mlps = nn.ModuleList()
        self.bns = nn.ModuleList()
        c = in_dim
        for ch in channels:
            self.mlps.append(nn.Conv1d(c, ch, 1))
            self.bns.append(nn.BatchNorm1d(ch))
            c = ch
        self.proj = nn.Linear(c, out_dim)

    def forward(self, pts, mask):  # pts [B, P, C], mask [B, P]
        x = pts.transpose(1, 2)                      # [B, C, P]
        for mlp, bn in zip(self.mlps, self.bns):
            x = F.relu(bn(mlp(x)))
        x = x.masked_fill(~mask[:, None, :], float("-inf"))
        x = torch.amax(x, dim=2)
        x = torch.where(torch.isinf(x), torch.zeros_like(x), x)
        return self.proj(x)


def vgg_mapping(depth=11):
    """torch name -> flax path map for TorchVGGSkipPool -> AppearanceNet."""
    mapping = {}
    ci = 0
    for item in VGG_PLANS[depth]:
        if item == "M":
            continue
        mapping[f"convs.{ci}"] = ("backbone", f"conv_{ci}")
        mapping[f"bns.{ci}"] = ("backbone", f"bn_{ci}")
        ci += 1
    for k in range(3):
        mapping[f"reduces.{k}"] = (f"reduce_{k}",)
        mapping[f"reduce_bns.{k}"] = (f"reduce_bn_{k}",)
    mapping["proj"] = ("proj",)
    return mapping


def pointnet_mapping(n_layers=2):
    mapping = {}
    for i in range(n_layers):
        mapping[f"mlps.{i}"] = (f"mlp_{i}",)
        mapping[f"bns.{i}"] = (f"bn_{i}",)
    mapping["proj"] = ("proj",)
    return mapping
