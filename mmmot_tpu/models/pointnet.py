"""LiDAR branch: PointNet over per-detection point sets.

Rebuild of the reference LiDAR extractor (reference: models/point_net.py ->
PointNet_v1: shared conv1d MLP over points in each detection's frustum,
max-pooled to a per-detection embedding).  TPU-first choices:

* the shared per-point MLP is expressed as Dense over the channel axis of a
  ``[..., N, P, C]`` tensor — XLA lowers this to one large MXU matmul over
  all detections and points at once (no per-detection loops);
* the pool is a *masked* max (padded points excluded explicitly rather than
  relying on zero-padding tricks);
* optional T-Net input transform kept behind a config flag.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmmot_tpu.config import PointConfig
from mmmot_tpu.models.layers import MaskedBatchNorm
from mmmot_tpu.ops.masking import masked_max


class TNet(nn.Module):
    """PointNet input-transform network predicting a KxK alignment matrix."""

    k: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, point_mask, *, train: bool = False):
        x = pts
        for i, ch in enumerate((64, 128, 256)):
            x = nn.Dense(ch, dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"mlp_{i}")(x)
            x = MaskedBatchNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                                name=f"bn_{i}")(
                x, point_mask, use_running_average=not train)
            x = nn.relu(x)
        g = masked_max(x, point_mask[..., None], axis=-2)
        g = nn.Dense(128, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc_0")(g)
        g = nn.relu(g)
        mat = nn.Dense(self.k * self.k, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       kernel_init=nn.initializers.zeros, name="fc_mat")(g)
        eye = jnp.eye(self.k, dtype=mat.dtype).reshape(self.k * self.k)
        mat = (mat + eye).reshape(g.shape[:-1] + (self.k, self.k))
        return mat


class PointNet(nn.Module):
    """Per-detection point-cloud embedding.

    Inputs: ``points [..., N, P, Cin]``, ``point_mask [..., N, P]`` (valid
    points), ``det_mask [..., N]`` (valid detection slots).
    Output: ``[..., N, out_dim]``.
    """

    cfg: PointConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, point_mask, det_mask=None, *,
                 train: bool = False):
        pts = points.astype(self.dtype)
        pm = point_mask & (det_mask[..., None] if det_mask is not None
                           else jnp.ones_like(point_mask))

        if self.cfg.use_tnet:
            mat = TNet(k=3, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="tnet")(pts[..., :3], pm, train=train)
            xyz = jnp.einsum("...pc,...cd->...pd", pts[..., :3], mat)
            pts = jnp.concatenate([xyz, pts[..., 3:]], axis=-1)

        x = pts
        for i, ch in enumerate(self.cfg.channels):
            x = nn.Dense(ch, dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"mlp_{i}")(x)
            x = MaskedBatchNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                                name=f"bn_{i}")(
                x, pm, use_running_average=not train)
            x = nn.relu(x)

        feat = masked_max(x, pm[..., None], axis=-2)      # [..., N, C_last]
        feat = nn.Dense(self.cfg.out_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(feat)
        if det_mask is not None:
            feat = feat * det_mask[..., None].astype(feat.dtype)
        return feat
