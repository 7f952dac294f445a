"""Pallas TPU kernel: the full fused association-cost tensor.

BASELINE.json north star: "the cross-frame affinity scorer (correlation +
start/end/link heads) runs as a single Pallas kernel producing the full
association cost tensor".  This kernel computes, for a batch of frame
pairs, everything between the per-detection embeddings and the LP solver:

    for every branch k (fused / image / lidar):
        pair_k   = op(a_k[:, None, :], b_k[None, :, :])    # VPU, VMEM only
        hidden_k = relu(BN_eval(pair_k @ W1_k + b1_k))     # MXU
        score_k  = hidden_k @ w2_k + b2_k                  # MXU
    link      = mask * combine_k(score_k)                  # add | avg
    link_norm = dual masked softmax(link)                  # rows + cols
    new       = MLP([b_fused | colpool(link)])             # birth head (v2)
    end       = MLP([a_fused | rowpool(link)])             # death head (v2)

The XLA path (models/affinity.py + models/new_end.py) materialises the
pairwise tensor ``[B, N, N, len(ops)*D]`` and the hidden activations
``[B, N, N, H]`` in HBM between ops — ~0.5 GB of HBM traffic per 64-frame
window at the flagship scale; here both live only in VMEM, one row-block
at a time.

Numerics mirror the XLA eval path op-for-op (same dtype journey: dots with
f32 MXU accumulation cast back to the compute dtype, eval BatchNorm applied
explicitly in f32 — NOT folded into the Dense — then relu in compute
dtype), so f32 outputs match the XLA path to float-associativity and bf16
outputs track the bf16 XLA path.  Supported: ``num_layers=2``,
``gnn_rounds=0`` (the flagship affinity), new/end ``version=2``, all pool
modes (max/mean/softmax) and softmax modes (dual/single/none); anything
else falls back to the XLA path upstream (tracker/tracker.py).
``gnn_rounds > 0`` composes via pre-kernel XLA hops, and the learned
motion affinity (``affinity.motion_dim``) via the optional ``link_bias``
input — neither needs the fallback.

Reference anchors: models/gcn.py (correlation + link head), models/
new_end.py NewEndIndicator_v2, tracking_net.py score fusion — SURVEY.md
§2.8/§2.9.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # matches ops/masking.py (finite: NaN-free masked softmax)


def _corr(a, b, op: str):
    if op == "subabs":
        return jnp.abs(a - b)
    if op == "mul":
        return a * b
    if op == "diff":
        return a - b
    if op == "cosine":
        an = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-8)
        bn = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-8)
        return an * bn
    raise ValueError(f"unsupported correlation op for pallas kernel: {op!r}")


def _masked_softmax(x, pm_f, axis):
    """ops/masking.py masked_softmax, same op order/dtypes (forward only)."""
    logits = jnp.where(pm_f > 0, x, jnp.asarray(NEG_INF, x.dtype))
    logits = logits - jnp.max(logits, axis=axis, keepdims=True)
    un = jnp.exp(logits) * pm_f.astype(x.dtype)
    den = jnp.maximum(jnp.sum(un, axis=axis, keepdims=True),
                      jnp.asarray(1e-30, x.dtype))
    return un / den


def _pool(link, pm_f, axis, mode: str):
    """ops/masking.py masked_{max,mean} / softmax-weighted pooling."""
    if mode == "max":
        neg = jnp.where(pm_f > 0, link, jnp.asarray(NEG_INF, link.dtype))
        m = jnp.max(neg, axis=axis)
        any_valid = jnp.max(pm_f, axis=axis) > 0
        return jnp.where(any_valid, m, jnp.zeros_like(m))
    if mode == "mean":
        mf = pm_f.astype(link.dtype)
        num = jnp.sum(link * mf, axis=axis)
        den = jnp.sum(mf, axis=axis)
        return num / jnp.maximum(den, jnp.ones_like(den))
    if mode == "softmax":
        w = _masked_softmax(link, pm_f, axis)
        return jnp.sum(w * link, axis=axis)
    raise ValueError(f"unknown pool {mode!r}")


def _kernel(a_ref, b_ref, mp_ref, mpc_ref, mc_ref, *refs,
            ops: Tuple[str, ...], pool: str, softmax_mode: str,
            avg: bool, block_rows: int, has_bias: bool = False):
    # Optional additive link bias (the learned motion affinity,
    # models/affinity.py::MotionScore, computed as a batched XLA op
    # upstream): added to the combined link score in f32 BEFORE the mask
    # multiply, the dual-softmax normalisation and the new/end pooling —
    # exactly where the XLA path (TrackingNet.affinity_link) adds it.
    # When absent the emitted ops are identical to the bias-free kernel.
    if has_bias:
        bias_ref, *refs = refs
    (w1_ref, b1_ref, mean_ref, inv_ref, sc_ref, sb_ref,
     w2_ref, b2_ref,
     wn1_ref, wnp_ref, bn1_ref, wn2_ref, bn2_ref,
     we1_ref, wep_ref, be1_ref, ew2_ref, eb2_ref,
     link_ref, norm_ref, new_ref, end_ref) = refs
    K = a_ref.shape[1]
    N = a_ref.shape[2]
    cdt = a_ref.dtype
    f32 = jnp.float32
    # Masks arrive f32 (Mosaic restricts several sub-32-bit vector shape
    # ops — e.g. minor-dim insertion like mask[:, None] — to 32-bit).
    mp = mp_ref[0, 0]                    # [N] f32 0/1
    mc = mc_ref[0, 0]
    pm_f = mp[:, None] * mc[None, :]     # [N, N] f32

    def row_block(i, _):
        sl = pl.ds(i * block_rows, block_rows)
        acc = None                                        # f32 [BR*N, 1]
        for k in range(K):
            ab = a_ref[0, k, sl, :]                       # [BR, D]
            bb = b_ref[0, k]                              # [N, D]
            pieces = [
                _corr(ab[:, None, :], bb[None, :, :], op).reshape(
                    block_rows * N, -1)
                for op in ops]
            pair = (jnp.concatenate(pieces, axis=-1) if len(pieces) > 1
                    else pieces[0])
            h0 = (jnp.dot(pair, w1_ref[0, k],
                          preferred_element_type=f32).astype(cdt)
                  + b1_ref[0, k])                         # [BR*N, H]
            # Eval-mode MaskedBatchNorm, f32 exactly like models/layers.py
            # (NOT folded into the Dense — folding reassociates the math).
            hf = ((h0.astype(f32) - mean_ref[0, k]) * inv_ref[0, k]
                  * sc_ref[0, k] + sb_ref[0, k]).astype(cdt)
            h = jnp.maximum(hf, jnp.zeros((), cdt))
            # Score accumulates in f32 ([BR*N, 1] — reshapes to [BR, N]
            # happen in f32; Mosaic restricts bf16 reshapes).
            sk = (jnp.dot(h, w2_ref[0, k],
                          preferred_element_type=f32)
                  + b2_ref[0, k])                         # [BR*N, 1] f32
            acc = sk if acc is None else acc + sk
        if avg:
            acc = acc / jnp.asarray(K, f32)
        acc = acc[:, 0].reshape(block_rows, N)
        if has_bias:
            acc = acc + bias_ref[0, sl, :]
        # Prev-mask block from the COLUMN-layout copy: a dynamic slice on
        # the lane (minor) dim would need 128 alignment; on the sublane
        # dim block_rows alignment suffices.
        mp_blk = mpc_ref[0, sl, :]                        # [BR, 1] f32
        link_ref[0, sl, :] = (acc * (mp_blk * mc[None, :])).astype(cdt)
        return 0

    jax.lax.fori_loop(0, N // block_rows, row_block, 0)

    link = link_ref[0, :, :]
    # Normalisation (models/affinity.py normalize_link).
    if softmax_mode == "none":
        norm_ref[0, :, :] = link
    else:
        row = _masked_softmax(link, pm_f, axis=-1)
        if softmax_mode == "single":
            norm_ref[0, :, :] = row
        else:
            col = _masked_softmax(link, pm_f, axis=-2)
            norm_ref[0, :, :] = (jnp.asarray(0.5, cdt) * (row + col)
                                 ).astype(cdt)

    # New/end heads (models/new_end.py NewEndIndicator v2): the feature |
    # pooled-evidence concat Dense is computed as a SPLIT matmul (feature
    # part on the MXU + rank-1 pooled part) — Mosaic has no sub-32-bit
    # unaligned concat, and the split is the same contraction up to float
    # associativity.
    row_best = _pool(link, pm_f, axis=-1, mode=pool).astype(f32)   # [N]
    col_best = _pool(link, pm_f, axis=-2, mode=pool).astype(f32)   # [N]

    def head(feat, pooled, w_feat, w_pool, b1, w2, b2):
        hf = (jnp.dot(feat, w_feat, preferred_element_type=f32)
              + pooled[:, None] * w_pool[0][None, :] + b1[None, :])
        h = jnp.maximum(hf.astype(cdt), jnp.zeros((), cdt))
        return (jnp.dot(h, w2, preferred_element_type=f32)
                + b2[0])[:, 0]                            # [N] f32

    new = head(b_ref[0, 0], col_best, wn1_ref[:, :], wnp_ref, bn1_ref[:],
               wn2_ref[:, :], bn2_ref)
    end = head(a_ref[0, 0], row_best, we1_ref[:, :], wep_ref, be1_ref[:],
               ew2_ref[:, :], eb2_ref)
    new_ref[0, 0, :] = (new * mc).astype(cdt)
    end_ref[0, 0, :] = (end * mp).astype(cdt)


def _pad_n(x, n_pad, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n_pad - x.shape[axis])
    return jnp.pad(x, pad) if pad[axis][1] else x


@functools.partial(
    jax.jit, static_argnames=("ops", "pool", "softmax_mode", "avg",
                              "block_rows", "interpret"))
def pallas_affinity(a: jnp.ndarray, b: jnp.ndarray,
                    mask_prev: jnp.ndarray, mask_curr: jnp.ndarray,
                    params: Dict[str, jnp.ndarray], *,
                    link_bias: jnp.ndarray | None = None,
                    ops: Tuple[str, ...] = ("subabs",),
                    pool: str = "max", softmax_mode: str = "dual",
                    avg: bool = False, block_rows: int = 16,
                    interpret: bool = False):
    """Fused association-cost tensor for a batch of frame pairs.

    a, b:       [B, K, N, D] prev/curr per-branch embeddings (branch 0 =
                fused; order must match ``score_branches``), f32 or bf16.
    mask_prev/
    mask_curr:  [B, N] bool validity.
    params:     stacked head parameters from
                :func:`build_affinity_params`.
    link_bias:  optional [B, N, N] float32 additive link term (the learned
                motion affinity) applied before normalisation and the
                new/end heads — matching TrackingNet.affinity_link.
    Returns (link [B,N,N], link_norm [B,N,N], new [B,N], end [B,N]) in the
    input compute dtype.  N is padded internally to a multiple of
    ``block_rows`` (and TPU sublane alignment); outputs are sliced back.
    """
    B, K, N, D = a.shape
    cdt = a.dtype
    # Sublane alignment: 16 covers bf16 packing; also the row-block size.
    align = max(block_rows, 16)
    n_pad = -(-N // align) * align
    a = _pad_n(a, n_pad, 2)
    b = _pad_n(b, n_pad, 2)
    # Masks/new/end carry an explicit singleton axis: Mosaic requires the
    # last two block dims to be (8,128)-divisible OR equal to the array
    # dims — [B, 1, N] satisfies that, [B, N] blocked (1, N) does not.
    mp = _pad_n(mask_prev.astype(jnp.float32), n_pad, 1)[:, None, :]
    mpc = jnp.swapaxes(mp, 1, 2)          # [B, N, 1] column layout
    mc = _pad_n(mask_curr.astype(jnp.float32), n_pad, 1)[:, None, :]

    H = params["w2"].shape[-2]
    hh = params["wn2"].shape[-2]
    Dc = params["w1"].shape[-2]

    has_bias = link_bias is not None
    if has_bias:
        link_bias = _pad_n(_pad_n(link_bias.astype(jnp.float32),
                                  n_pad, 1), n_pad, 2)
    kernel = functools.partial(
        _kernel, ops=ops, pool=pool, softmax_mode=softmax_mode, avg=avg,
        block_rows=min(block_rows, n_pad), has_bias=has_bias)
    vm = pltpu.VMEM
    wspecs = [
        pl.BlockSpec((1, K, Dc, H), lambda i: (0, 0, 0, 0), memory_space=vm),
        pl.BlockSpec((1, K, H), lambda i: (0, 0, 0), memory_space=vm),      # b1
        pl.BlockSpec((1, K, H), lambda i: (0, 0, 0), memory_space=vm),      # mean
        pl.BlockSpec((1, K, H), lambda i: (0, 0, 0), memory_space=vm),      # inv
        pl.BlockSpec((1, K, H), lambda i: (0, 0, 0), memory_space=vm),      # scale
        pl.BlockSpec((1, K, H), lambda i: (0, 0, 0), memory_space=vm),      # bias
        pl.BlockSpec((1, K, H, 1), lambda i: (0, 0, 0, 0),
                     memory_space=vm),                                      # w2
        pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=vm),            # b2
        pl.BlockSpec((D, hh), lambda i: (0, 0), memory_space=vm),           # wn1
        pl.BlockSpec((1, hh), lambda i: (0, 0), memory_space=vm),           # wnp
        pl.BlockSpec((hh,), lambda i: (0,), memory_space=vm),               # bn1
        pl.BlockSpec((hh, 1), lambda i: (0, 0), memory_space=vm),           # wn2
        pl.BlockSpec((1,), lambda i: (0,), memory_space=vm),                # bn2
        pl.BlockSpec((D, hh), lambda i: (0, 0), memory_space=vm),           # we1
        pl.BlockSpec((1, hh), lambda i: (0, 0), memory_space=vm),           # wep
        pl.BlockSpec((hh,), lambda i: (0,), memory_space=vm),               # be1
        pl.BlockSpec((hh, 1), lambda i: (0, 0), memory_space=vm),           # ew2
        pl.BlockSpec((1,), lambda i: (0,), memory_space=vm),                # eb2
    ]
    p = params
    link, norm, new, end = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, n_pad, n_pad), cdt),
            jax.ShapeDtypeStruct((B, n_pad, n_pad), cdt),
            jax.ShapeDtypeStruct((B, 1, n_pad), cdt),
            jax.ShapeDtypeStruct((B, 1, n_pad), cdt),
        ),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, K, n_pad, D), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, K, n_pad, D), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, n_pad, 1), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0),
                             memory_space=vm),
            ] + ([pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0),
                               memory_space=vm)] if has_bias else []
                 ) + wspecs,
            out_specs=(
                pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0),
                             memory_space=vm),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * n_pad * n_pad * (Dc * H + H),
            bytes_accessed=(2 * B * K * n_pad * D + K * Dc * H
                            + 2 * B * n_pad * n_pad) * a.dtype.itemsize,
            transcendentals=B * 2 * n_pad * n_pad,
        ),
        interpret=interpret,
    )(a, b, mp, mpc, mc,
      *((link_bias,) if has_bias else ()),
      p["w1"][None], p["b1"][None], p["bn_mean"][None], p["bn_inv"][None],
      p["bn_scale"][None], p["bn_bias"][None], p["w2"][None], p["b2"][None],
      p["wn1"], p["wnp"], p["bn1"], p["wn2"], p["bn2"],
      p["we1"], p["wep"], p["be1"], p["ew2"], p["eb2"])
    return (link[:, :N, :N], norm[:, :N, :N], new[:, 0, :N],
            end[:, 0, :N])


def pallas_supported(cfg) -> bool:
    """Whether the fused kernel covers this ModelConfig's affinity math.

    ``gnn_rounds > 0`` is supported since round 5: the message-passing
    hops run OUTSIDE the kernel as batched XLA ops (net.gnn_refine) and
    the kernel consumes the refined embeddings — see
    ``TrackingModule._affinity_pallas``.
    """
    aff, ne = cfg.affinity, cfg.new_end
    return (aff.num_layers == 2
            and ne.version >= 2
            and all(op in ("subabs", "mul", "diff", "cosine")
                    for op in aff.correlation_ops)
            and ne.pool in ("max", "mean", "softmax")
            and aff.softmax_mode in ("dual", "single", "none")
            and cfg.score_fusion in ("add", "avg", "fused-only"))


def build_affinity_params(variables, cfg, branches: Tuple[str, ...],
                          compute_dtype) -> Dict[str, jnp.ndarray]:
    """Stack per-branch affinity-head + new/end-head parameters for the
    kernel.  BN statistics stay f32 (eval BN runs in f32, like
    models/layers.py MaskedBatchNorm); dense weights are pre-cast to the
    compute dtype (flax Dense casts at apply time).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    eps = 1e-5

    def stack(fn):
        return jnp.stack([fn(params[f"affinity_{b}"],
                             stats[f"affinity_{b}"]) for b in branches])

    out = {
        "w1": stack(lambda p, s: p["head_0"]["kernel"]).astype(compute_dtype),
        "b1": stack(lambda p, s: p["head_0"]["bias"]).astype(compute_dtype),
        "bn_mean": stack(lambda p, s: s["head_bn_0"]["mean"]),
        "bn_inv": stack(
            lambda p, s: jax.lax.rsqrt(s["head_bn_0"]["var"] + eps)),
        "bn_scale": stack(lambda p, s: p["head_bn_0"]["scale"]),
        "bn_bias": stack(lambda p, s: p["head_bn_0"]["bias"]),
        "w2": stack(
            lambda p, s: p["head_out"]["kernel"]).astype(compute_dtype),
        # Scalar/bias terms stay f32: Mosaic lowers only 32-bit scalar
        # extracts, and the kernel's score path accumulates in f32.
        "b2": stack(lambda p, s: p["head_out"]["bias"][0]).astype(
            jnp.float32),
    }
    ne = params["new_end"]
    # The new/end Dense over concat([feat, pooled]) splits into a feature
    # part (rows :-1, MXU matmul) and the pooled-evidence row (rank-1 add
    # in the kernel) — same contraction, Mosaic-friendly shapes.
    for (k1, kp, k1b, k2, k2b), mlp in (
            (("wn1", "wnp", "bn1", "wn2", "bn2"), ne["new_mlp"]),
            (("we1", "wep", "be1", "ew2", "eb2"), ne["end_mlp"])):
        out[k1] = mlp["dense_0"]["kernel"][:-1].astype(compute_dtype)
        out[kp] = mlp["dense_0"]["kernel"][-1:].astype(jnp.float32)
        out[k1b] = mlp["dense_0"]["bias"].astype(jnp.float32)
        out[k2] = mlp["dense_1"]["kernel"].astype(compute_dtype)
        out[k2b] = mlp["dense_1"]["bias"].astype(jnp.float32)     # [1] f32
    return out
