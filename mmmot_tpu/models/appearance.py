"""Image appearance branch: VGG backbone with skip pooling.

Rebuild of the reference appearance extractor (reference: models/appear_net.py
-> VGG-16-bn backbone + multi-stage "skip pooling": pooled features from
several conv stages are 1x1-reduced, concatenated, and projected to a fixed
per-detection embedding).  TPU-first choices:

* NHWC layout + channels-last convs (XLA's native TPU layout, feeds the MXU);
* detection slots folded into the batch axis -> one big conv batch per frame
  pair instead of per-crop python loops;
* mask-aware BatchNorm so padded slots never pollute batch statistics;
* compute dtype configurable (bfloat16 on TPU, float32 for parity tests).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmmot_tpu.config import AppearanceConfig
from mmmot_tpu.models.layers import DropBlock2D, MaskedBatchNorm

# VGG plans: channels per conv, "M" = 2x2 max-pool.
VGG_PLANS = {
    11: (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    13: (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
         512, 512, "M"),
    16: (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
         512, 512, 512, "M"),
    19: (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
         512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


def space_to_depth(x, block: int = 2):
    """[..., H, W, C] -> [..., H/b, W/b, b*b*C] (pure relayout)."""
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    x = x.reshape(lead + (h // block, block, w // block, block, c))
    n = len(lead)
    perm = tuple(range(n)) + (n, n + 2, n + 1, n + 3, n + 4)
    x = x.transpose(perm)
    return x.reshape(lead + (h // block, w // block, block * block * c))


def trunk_ops(depth: int, s2d_stem: bool = False):
    """Canonical trunk op sequence shared by the float backbone and the
    int8 quantized path (models/quantize.py), so both implement the SAME
    architecture for every (depth, s2d_stem) combination:

        ("s2d",)            2x2 space-to-depth input relayout
        ("conv", i, ch)     3x3 conv_i -> ch channels (+BN+ReLU)
        ("pool",)           2x2 max-pool
        ("stage",)          stage boundary (feature map recorded)

    With ``s2d_stem`` the s2d relayout replaces the FIRST pool (the stem
    convs run at half resolution on block*block*C input channels); every
    stage's output shape is unchanged.
    """
    ops = []
    if s2d_stem:
        ops.append(("s2d",))
    conv_i = 0
    first_pool = s2d_stem
    for item in VGG_PLANS[depth]:
        if item == "M":
            if first_pool:
                first_pool = False      # the s2d already downsampled
            else:
                ops.append(("pool",))
            ops.append(("stage",))
        else:
            ops.append(("conv", conv_i, item))
            conv_i += 1
    return tuple(ops)


class VGGBackbone(nn.Module):
    """VGG conv trunk returning the feature map after every pooling stage.

    ``s2d_stem`` (AppearanceConfig.s2d_stem): TPU stem redesign — a 2x2
    space-to-depth replaces pool1, so the stage-1 convs run at half
    resolution on 12 input channels (MXU-shaped contraction, ~4x less
    stem compute).  NOT weight-compatible with the reference stem.
    """

    depth: int = 16
    batch_norm: bool = True
    width_mult: float = 1.0
    s2d_stem: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool = False):
        stages = []
        for op in trunk_ops(self.depth, self.s2d_stem):
            if op[0] == "s2d":
                x = space_to_depth(x, 2)
            elif op[0] == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif op[0] == "stage":
                stages.append(x)
            else:
                _, conv_i, item = op
                ch = max(8, int(item * self.width_mult))
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"conv_{conv_i}")(x)
                if self.batch_norm:
                    x = MaskedBatchNorm(dtype=self.dtype,
                                        param_dtype=self.param_dtype,
                                        name=f"bn_{conv_i}")(
                        x, mask, use_running_average=not train)
                x = nn.relu(x)
        return stages


class AppearanceNet(nn.Module):
    """Per-detection appearance embedding with skip pooling.

    Input crops ``[..., H, W, 3]`` (any leading batch/slot axes), slot mask
    broadcastable over the leading axes.  Output ``[..., out_dim]``.
    """

    cfg: AppearanceConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops, mask=None, train: bool = False):
        # ``train`` is positional-or-keyword (not keyword-only) so the
        # module can be wrapped in nn.checkpoint with static_argnums.
        lead = crops.shape[:-3]
        h, w, c = crops.shape[-3:]
        x = crops.reshape((-1, h, w, c)).astype(self.dtype)
        flat_mask = None if mask is None else mask.reshape((-1,))

        stages = VGGBackbone(depth=self.cfg.depth,
                             batch_norm=self.cfg.batch_norm,
                             width_mult=self.cfg.width_mult,
                             s2d_stem=self.cfg.s2d_stem,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name="backbone")(x, flat_mask, train=train)

        if self.cfg.dropblock:
            stages = [DropBlock2D(rate=self.cfg.dropblock_rate,
                                  block_size=self.cfg.dropblock_size,
                                  name=f"dropblock_{i}")(
                s, deterministic=not train) for i, s in enumerate(stages)]

        if self.cfg.skip_pool:
            # Skip pooling over the last three stages (conv3/conv4/conv5 in
            # the reference): global max-pool each map, 1x1-reduce, concat.
            picked = stages[-3:]
        else:
            picked = stages[-1:]

        pooled = []
        for i, s in enumerate(picked):
            p = jnp.max(s, axis=(-3, -2))          # global max pool [B*, C]
            p = nn.Dense(self.cfg.reduction_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"reduce_{i}")(p)
            p = MaskedBatchNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                                name=f"reduce_bn_{i}")(
                p, flat_mask, use_running_average=not train)
            p = nn.relu(p)
            pooled.append(p)
        feat = jnp.concatenate(pooled, axis=-1)
        feat = nn.Dense(self.cfg.out_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(feat)
        feat = feat.reshape(lead + (self.cfg.out_dim,))
        if mask is not None:
            feat = feat * mask[..., None].astype(feat.dtype)
        return feat
