"""Track birth ("new") and death ("end") heads.

Rebuild of the reference start/end indicators (reference: models/new_end.py,
NewEndIndicator_v1/_v2): per-detection scores predicting whether a current
detection starts a new track and whether a previous detection's track ends.
v2 pools the affinity-matrix row/column evidence together with the detection
feature; v1 uses the feature alone.  Both operate on masked padded slots.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mmmot_tpu.config import NewEndConfig
from mmmot_tpu.models.layers import MLP
from mmmot_tpu.ops.masking import masked_max, masked_mean, masked_softmax, pair_mask


class NewEndHead(nn.Module):
    """Outputs (new_score [.., Nc], end_score [.., Np])."""

    cfg: NewEndConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _pool(self, link, pm, axis):
        if self.cfg.pool == "max":
            return masked_max(link, pm, axis=axis)
        if self.cfg.pool == "mean":
            return masked_mean(link, pm, axis=axis)
        if self.cfg.pool == "softmax":
            w = masked_softmax(link, pm, axis=axis)
            return jnp.sum(w * link, axis=axis)
        raise ValueError(f"unknown pool {self.cfg.pool!r}")

    @nn.compact
    def __call__(self, feat_prev, feat_curr, link, mask_prev, mask_curr, *,
                 train: bool = False):
        pm = pair_mask(mask_prev, mask_curr)

        if self.cfg.version >= 2:
            # Evidence from the affinity matrix: how strongly is each det
            # matched by its best/aggregate counterpart in the other frame.
            row_best = self._pool(link, pm, axis=-1)      # [.., Np]
            col_best = self._pool(link, pm, axis=-2)      # [.., Nc]
            end_in = jnp.concatenate(
                [feat_prev, row_best[..., None]], axis=-1)
            new_in = jnp.concatenate(
                [feat_curr, col_best[..., None]], axis=-1)
        else:
            end_in, new_in = feat_prev, feat_curr

        h = self.cfg.hidden_dim
        new_score = MLP((h, 1), use_bn=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="new_mlp")(
            new_in, train=train)[..., 0]
        end_score = MLP((h, 1), use_bn=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="end_mlp")(
            end_in, train=train)[..., 0]
        new_score = new_score * mask_curr.astype(new_score.dtype)
        end_score = end_score * mask_prev.astype(end_score.dtype)
        return new_score, end_score
