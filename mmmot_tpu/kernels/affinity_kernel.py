"""Pallas TPU kernel: fused correlation + link-score head.

The association cost tensor is the tracker's per-frame hot op
(BASELINE.json north star: "the cross-frame affinity scorer (correlation +
start/end/link heads) runs as a single Pallas kernel producing the full
association cost tensor").  The XLA path materialises the pairwise
correlation tensor ``[N, N, D]`` and the hidden activations ``[N, N, H]`` in
HBM between ops; this kernel keeps both entirely in VMEM:

    for each row-block of prev detections (grid dim 0):
        pair   = op(a_block[:, None, :], b[None, :, :])   # VPU, VMEM only
        hidden = relu(pair @ W1 + b1)                      # MXU
        link   = hidden @ w2 + b2                          # MXU
        out_block[:, :] = link

Inference BatchNorm folds into (W1, b1) beforehand (:func:`fold_bn_into_dense`),
matching the XLA eval path bit-for-bit up to dot-product reassociation.

Correlation ops supported: ``subabs`` (|a-b|), ``mul``, ``diff`` — selected
statically; multiple ops concatenate along the feature axis like the XLA
path (models/affinity.py correlation_tensor).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn_into_dense(kernel, bias, scale, bn_bias, mean, var,
                       eps: float = 1e-5):
    """Fold eval-mode BN(y) = (y - mean) * rsqrt(var+eps) * scale + bn_bias
    into the preceding Dense: returns (kernel', bias')."""
    inv = scale / jnp.sqrt(var + eps)
    return kernel * inv[None, :], (bias - mean) * inv + bn_bias


def _corr(a, b, op: str):
    if op == "subabs":
        return jnp.abs(a - b)
    if op == "mul":
        return a * b
    if op == "diff":
        return a - b
    raise ValueError(f"unsupported correlation op for pallas kernel: {op!r}")


def _kernel(a_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
            ops: Tuple[str, ...], block_rows: int):
    a = a_ref[:]                      # [BR, D]
    b = b_ref[:]                      # [N, D]
    n = b.shape[0]
    d = a.shape[1]
    br = a.shape[0]

    # Pairwise correlation features, kept in VMEM: [BR*N, len(ops)*D].
    pieces = []
    for op in ops:
        c = _corr(a[:, None, :], b[None, :, :], op)      # [BR, N, D]
        pieces.append(c.reshape(br * n, d))
    pair = (jnp.concatenate(pieces, axis=-1) if len(pieces) > 1
            else pieces[0])

    hidden = jnp.maximum(
        jnp.dot(pair, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:][None, :], 0.0)                        # [BR*N, H]
    link = (jnp.dot(hidden, w2_ref[:],
                    preferred_element_type=jnp.float32)
            + b2_ref[:][None, :])                         # [BR*N, 1]
    out_ref[:, :] = link.reshape(br, n)


@functools.partial(jax.jit, static_argnames=("ops", "block_rows",
                                             "interpret"))
def pallas_link_scores(feat_prev: jnp.ndarray, feat_curr: jnp.ndarray,
                       w1: jnp.ndarray, b1: jnp.ndarray,
                       w2: jnp.ndarray, b2: jnp.ndarray,
                       ops: Tuple[str, ...] = ("subabs",),
                       block_rows: int = 8,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused link-score matrix [N, N] from per-frame features [N, D].

    w1 [len(ops)*D, H] (BN pre-folded), b1 [H], w2 [H, 1], b2 [1].
    N must be a multiple of ``block_rows``.
    """
    n, d = feat_prev.shape
    h = w1.shape[1]
    if n % block_rows:
        raise ValueError(f"N={n} not a multiple of block_rows={block_rows}")
    dtype = jnp.float32
    grid = (n // block_rows,)
    kernel = functools.partial(_kernel, ops=ops, block_rows=block_rows)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w1.shape[0], h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * (w1.shape[0] * h + h),
            bytes_accessed=(2 * n * d + w1.size + n * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(feat_prev.astype(dtype), feat_curr.astype(dtype),
      w1.astype(dtype), b1.astype(dtype), w2.astype(dtype),
      b2.astype(dtype))
