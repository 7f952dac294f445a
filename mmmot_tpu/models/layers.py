"""Shared building blocks: mask-aware normalisation, MLPs, DropBlock.

The reference relies on torch BatchNorm; a TPU rebuild over padded detection
slots must not let padding pollute batch statistics, so :class:`MaskedBatchNorm`
computes moments over valid slots only (and cross-replica via ``axis_name``
when data-parallel).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all-but-last axes, counting only mask-valid positions.

    Equivalent to torch ``BatchNorm{1,2}d`` when every position is valid
    (reference uses BN throughout appear_net/point_net).  Running statistics
    live in the ``batch_stats`` collection.
    """

    momentum: float = 0.9
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, use_running_average: bool):
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is None:
                cnt = jnp.asarray(math.prod(x.shape[:-1]), jnp.float32)
                s1 = jnp.sum(xf, axis=reduce_axes)
                s2 = jnp.sum(xf * xf, axis=reduce_axes)
            else:
                m = mask.astype(jnp.float32)
                while m.ndim < x.ndim - 1:
                    m = m[..., None]
                # Broadcast to per-position validity so the count includes
                # every reduced position (e.g. H*W for conv feature maps).
                m = jnp.broadcast_to(m, x.shape[:-1])[..., None]
                cnt = jnp.sum(m)
                s1 = jnp.sum(xf * m, axis=reduce_axes)
                s2 = jnp.sum(xf * xf * m, axis=reduce_axes)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                # torch BatchNorm stores the *unbiased* variance estimate in
                # running_var (normalisation itself uses the biased one).
                unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)

        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)
        inv = jax.lax.rsqrt(var + self.eps)
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(self.dtype)


class MLP(nn.Module):
    """Dense stack with optional masked BN and ReLU between layers."""

    features: Sequence[int]
    use_bn: bool = True
    final_activation: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool = False):
        n = len(self.features)
        for i, feat in enumerate(self.features):
            x = nn.Dense(feat, dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"dense_{i}")(x)
            last = i == n - 1
            if not last or self.final_activation:
                if self.use_bn:
                    x = MaskedBatchNorm(dtype=self.dtype,
                                        param_dtype=self.param_dtype,
                                        name=f"bn_{i}")(
                        x, mask, use_running_average=not train)
                x = nn.relu(x)
        return x


class DropBlock2D(nn.Module):
    """Structured feature-map dropout (reference: models/dropblock.py).

    Drops contiguous ``block_size`` x ``block_size`` regions of NHWC feature
    maps during training; identity at inference.
    """

    rate: float = 0.1
    block_size: int = 7

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        h, w = x.shape[-3], x.shape[-2]
        bs = min(self.block_size, h, w)
        # Bernoulli seed rate gamma such that expected dropped fraction ~ rate.
        gamma = (self.rate / (bs ** 2)) * ((h * w) /
                                           max((h - bs + 1) * (w - bs + 1), 1))
        rng = self.make_rng("dropout")
        seed_shape = x.shape[:-3] + (h - bs + 1, w - bs + 1, 1)
        seeds = jax.random.bernoulli(rng, gamma, seed_shape).astype(x.dtype)
        pad = [(0, 0)] * (x.ndim - 3) + [
            (bs // 2, bs - 1 - bs // 2), (bs // 2, bs - 1 - bs // 2), (0, 0)]
        seeds = jnp.pad(seeds, pad)
        # Expand each seed into a block via max pooling.
        block = nn.max_pool(seeds, (bs, bs), strides=(1, 1), padding="SAME")
        keep = 1.0 - block
        denom = jnp.maximum(jnp.mean(keep, axis=(-3, -2), keepdims=True), 1e-6)
        return x * keep / denom
