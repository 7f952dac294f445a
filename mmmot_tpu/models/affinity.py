"""Cross-frame affinity / correlation module.

Rebuild of the reference pairwise scorer (reference: models/gcn.py —
correlation ops over (prev, curr) detection embedding pairs, small conv head
producing the N_prev x N_curr link-score matrix, optional message-passing
refinement).  TPU-first choices:

* the pairwise tensor ``[B, N, N, H]`` is produced by one fused broadcast —
  XLA turns the per-pair Dense layers into batched MXU matmuls of shape
  ``(B*N*N, H)``; the Pallas kernel in ``kernels/affinity_kernel.py``
  additionally fuses correlation + head so the ``[B,N,N,H]`` intermediate
  never round-trips HBM;
* for the pure ``mul`` correlation with a linear head the score decomposes
  exactly into a bilinear form ``(a W) b^T`` — a single matmul with **no**
  pairwise intermediate at all (``bilinear_mul_score``); the general path is
  used whenever a nonlinear head or non-factorisable op (subabs) is selected;
* masked dual softmax normalisation (row + col) instead of data-dependent
  slicing over variable detection counts.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmmot_tpu.config import AffinityConfig
from mmmot_tpu.models.layers import MaskedBatchNorm
from mmmot_tpu.ops.masking import masked_softmax, pair_mask

CORRELATION_OPS = ("mul", "subabs", "diff", "cosine")


def correlation_tensor(a: jnp.ndarray, b: jnp.ndarray, ops: Tuple[str, ...]):
    """Pairwise interaction features: a [.., Na, D], b [.., Nb, D] ->
    [.., Na, Nb, len(ops)*D]."""
    ai = a[..., :, None, :]
    bj = b[..., None, :, :]
    outs = []
    for op in ops:
        if op == "mul":
            outs.append(ai * bj)
        elif op == "subabs":
            outs.append(jnp.abs(ai - bj))
        elif op == "diff":
            outs.append(ai - bj)
        elif op == "cosine":
            an = ai * jax.lax.rsqrt(jnp.sum(ai * ai, -1, keepdims=True) + 1e-8)
            bn = bj * jax.lax.rsqrt(jnp.sum(bj * bj, -1, keepdims=True) + 1e-8)
            outs.append(an * bn)
        else:
            raise ValueError(f"unknown correlation op {op!r}")
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


class GNNRefine(nn.Module):
    """Message-passing refinement across detections of both frames.

    Each detection aggregates softmax-weighted neighbour features from the
    *other* frame (one round = one bipartite attention hop).  ``dim`` 0
    means "same as the input feature dim" (resolved lazily so the module
    can be declared in ``setup`` before shapes are known).
    """

    dim: int = 0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_a, feat_b, mask_a, mask_b):
        dim = self.dim or feat_a.shape[-1]
        q = nn.Dense(dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="q")
        k = nn.Dense(dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="k")
        v = nn.Dense(dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="v")
        o = nn.Dense(dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="o")
        scale = 1.0 / jnp.sqrt(jnp.asarray(dim, self.dtype))

        def hop(x, y, my, valid_x):
            att = jnp.einsum("...id,...jd->...ij", q(x), k(y)) * scale
            w = masked_softmax(att, my[..., None, :], axis=-1)
            msg = jnp.einsum("...ij,...jd->...id", w, v(y))
            out = x + o(msg)
            return out * valid_x[..., None].astype(out.dtype)

        return hop(feat_a, feat_b, mask_b, mask_a), hop(feat_b, feat_a,
                                                        mask_a, mask_b)


class MotionScore(nn.Module):
    """Learned motion affinity: an MLP over per-pair box-geometry features
    (ops/boxes.py::pair_motion_features) producing a scalar added to the
    RAW link score before normalisation and the new/end heads.

    TPU-native addition (the reference's ILP scores links by appearance
    only — SURVEY §2.8): where the hard spatial gate (assoc.iou_gate) is an
    un-trained floor, this term is trained end-to-end through the joint
    association cross-entropy, so the model learns how much geometry should
    outvote appearance — decisive on look-alike (clone) regimes where
    appearance carries no signal.  Runs in float32 end-to-end (box
    coordinates and the tiny [.., N, N, 6] MLP are negligible next to the
    conv stack; f32 keeps every execution path bit-identical).

    The output layer is zero-initialised so a freshly-initialised model
    scores exactly like the appearance-only architecture — training grows
    the motion term from zero rather than starting from noise.
    """

    hidden_dim: int

    @nn.compact
    def __call__(self, box_prev, box_curr, mask_prev, mask_curr):
        from mmmot_tpu.ops.boxes import pair_motion_features

        g = pair_motion_features(box_prev, box_curr)
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=jnp.float32,
                             param_dtype=jnp.float32, name="dense_0")(g))
        s = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="dense_1")(h)
        pm = pair_mask(mask_prev, mask_curr)
        return s[..., 0] * pm.astype(jnp.float32)


class AffinityModule(nn.Module):
    """Pairwise link scores between prev/curr detection embeddings.

    Returns the raw link-score matrix ``[.., Np, Nc]`` (pre-normalisation)
    with invalid pairs forced to zero.

    setup-style (not nn.compact) so :meth:`refine` — the message-passing
    hops alone — is separately callable: the fused Pallas kernel consumes
    EMBEDDINGS, so with ``gnn_rounds > 0`` the tracker runs the hops as
    batched XLA ops and feeds the refined embeddings into the kernel
    (kernels/affinity_kernel.py), instead of abandoning the kernel.
    """

    cfg: AffinityConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.gnns = [GNNRefine(dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"gnn_{r}")
                     for r in range(self.cfg.gnn_rounds)]
        self.heads = [nn.Dense(self.cfg.hidden_dim, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"head_{i}")
                      for i in range(self.cfg.num_layers - 1)]
        self.head_bns = [MaskedBatchNorm(dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=f"head_bn_{i}")
                         for i in range(self.cfg.num_layers - 1)]
        self.head_out = nn.Dense(1, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="head_out")

    def refine(self, feat_prev, feat_curr, mask_prev, mask_curr):
        """The message-passing hops only: refined (prev, curr) embeddings."""
        a, b = feat_prev, feat_curr
        for g in self.gnns:
            a, b = g(a, b, mask_prev, mask_curr)
        return a, b

    def __call__(self, feat_prev, feat_curr, mask_prev, mask_curr, *,
                 train: bool = False):
        a, b = self.refine(feat_prev, feat_curr, mask_prev, mask_curr)
        pm = pair_mask(mask_prev, mask_curr)
        x = correlation_tensor(a, b, self.cfg.correlation_ops)
        for dense, bn in zip(self.heads, self.head_bns):
            x = dense(x)
            x = bn(x, pm, use_running_average=not train)
            x = nn.relu(x)
        score = self.head_out(x)[..., 0]
        return score * pm.astype(score.dtype)


def normalize_link(score, mask_prev, mask_curr, mode: str = "dual"):
    """Reference-style link normalisation: softmax over rows and/or columns
    of the masked score matrix, averaged (``dual``)."""
    pm = pair_mask(mask_prev, mask_curr)
    if mode == "none":
        return score * pm.astype(score.dtype)
    row = masked_softmax(score, pm, axis=-1)
    if mode == "single":
        return row
    col = masked_softmax(score, pm, axis=-2)
    return 0.5 * (row + col)
