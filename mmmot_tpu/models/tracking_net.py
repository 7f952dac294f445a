"""The composed tracking network.

Rebuild of the reference top-level net (reference: models/tracking_net.py ->
TrackingNet.forward(dets, det_info, det_split)): appearance + LiDAR feature
extraction, modality fusion, per-branch cross-frame affinity, start/end heads
and an optional detection-confidence head.

TPU-first shape contract (replaces the reference's variable-length
``det_split`` lists): every frame carries ``N`` padded detection slots with a
boolean mask, every batch element carries ``T`` frames, so one training batch
is a fixed-shape pytree:

    crops       [B, T, N, H, W, 3]   float   (ImageNet-normalised crops)
    points      [B, T, N, P, C]      float   (frustum point samples)
    point_mask  [B, T, N, P]         bool
    det_mask    [B, T, N]            bool

Forward produces affinities for every adjacent frame pair (T-1 pairs):

    link  [B, T-1, N, N]   raw link scores (prev x curr)
    new   [B, T-1, N]      birth score for each curr det
    end   [B, T-1, N]      death score for each prev det
    det   [B, T, N]        detection confidence (optional head)
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmmot_tpu.config import ModelConfig
from mmmot_tpu.models.affinity import (AffinityModule, MotionScore,
                                        normalize_link)
from mmmot_tpu.models.appearance import AppearanceNet
from mmmot_tpu.models.fusion import FusionModule
from mmmot_tpu.models.layers import MLP
from mmmot_tpu.models.new_end import NewEndHead
from mmmot_tpu.models.pointnet import PointNet


class AffinityOutput(NamedTuple):
    link: jnp.ndarray          # raw combined link scores [.., Np, Nc]
    link_norm: jnp.ndarray     # normalised link scores (dual softmax)
    new: jnp.ndarray           # [.., Nc]
    end: jnp.ndarray           # [.., Np]


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16}[name]


def score_branches(cfg: ModelConfig):
    """Feature branches that carry their own affinity scorer."""
    branches = ["fused"]
    if cfg.score_fusion != "fused-only" and cfg.fusion.keep_single \
            and cfg.use_image and cfg.use_lidar:
        branches += ["image", "lidar"]
    return tuple(branches)


class TrackingNet(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dt, pt = _dtype(c.compute_dtype), _dtype(c.param_dtype)
        if c.use_image:
            # remat: recompute the VGG trunk's activations during backward
            # (jax.checkpoint via the lifted flax transform) — trades ~33%
            # more conv FLOPs for ~5x less activation memory, unlocking
            # larger train batches/capacities.  train (argnum 3, counting
            # self) is static.
            appear_cls = (nn.checkpoint(AppearanceNet, static_argnums=(3,))
                          if c.remat else AppearanceNet)
            self.appear_net = appear_cls(cfg=c.appearance, dtype=dt,
                                         param_dtype=pt)
        if c.use_lidar:
            self.point_net = PointNet(cfg=c.point, dtype=dt, param_dtype=pt)
        self.fusion = FusionModule(cfg=c.fusion, dtype=dt, param_dtype=pt)

        self.score_branches = score_branches(c)
        self.affinity_mods = {
            b: AffinityModule(cfg=c.affinity, dtype=dt, param_dtype=pt,
                              name=f"affinity_{b}")
            for b in self.score_branches}
        if c.affinity.motion_dim:
            # Learned motion affinity (f32 — see MotionScore): created only
            # when configured so default param trees / checkpoints are
            # unchanged.
            self.motion = MotionScore(hidden_dim=c.affinity.motion_dim,
                                      name="motion")
        self.new_end = NewEndHead(cfg=c.new_end, dtype=dt, param_dtype=pt)
        self.det_head = MLP((c.new_end.hidden_dim, 1), use_bn=False,
                            dtype=dt, param_dtype=pt, name="det_head")

    # ---- feature extraction (per frame) --------------------------------
    def extract(self, crops, points, point_mask, det_mask, *,
                train: bool = False) -> Dict[str, jnp.ndarray]:
        """Per-detection embeddings for one or more frames.

        Leading axes of the inputs are arbitrary; the slot axis is ``N``.
        Returns a dict with keys ``fused`` (always) and ``image``/``lidar``
        when those branches exist and ``keep_single`` is on.
        """
        c = self.cfg
        img_feat = lidar_feat = None
        if c.use_image and crops is not None:
            # Positional ``train``: nn.checkpoint's static_argnums only
            # covers positional arguments.
            img_feat = self.appear_net(crops, det_mask, train)
        if c.use_lidar and points is not None:
            lidar_feat = self.point_net(points, point_mask, det_mask,
                                        train=train)
        return self.fusion(img_feat, lidar_feat, det_mask)

    def extract_given_image(self, img_feat, points, point_mask, det_mask, *,
                            train: bool = False) -> Dict[str, jnp.ndarray]:
        """``extract`` with the image embedding precomputed OUTSIDE the
        module — the int8 quantized trunk (models/quantize.py) produces
        ``img_feat`` and only PointNet + fusion run as flax."""
        c = self.cfg
        lidar_feat = None
        if c.use_lidar and points is not None:
            lidar_feat = self.point_net(points, point_mask, det_mask,
                                        train=train)
        return self.fusion(img_feat, lidar_feat, det_mask)

    # ---- affinity between two frames -----------------------------------
    def gnn_refine(self, feats_prev: Dict[str, jnp.ndarray],
                   feats_curr: Dict[str, jnp.ndarray], mask_prev, mask_curr
                   ) -> tuple:
        """Per-branch message-passing refinement ONLY (gnn_rounds hops of
        bipartite attention across the frame pair) — refined embedding
        dicts, non-branch keys (boxes/class ids/...) passed through.

        This is how ``gnn_rounds > 0`` composes with the fused Pallas
        affinity kernel: the hops run as batched XLA ops here, and the
        kernel consumes the refined embeddings (it implements correlation
        + heads + normalisation, which don't change with the GNN)."""
        out_p, out_c = dict(feats_prev), dict(feats_curr)
        for b in self.score_branches:
            if b not in feats_prev or b not in feats_curr:
                continue
            out_p[b], out_c[b] = self.affinity_mods[b].refine(
                feats_prev[b], feats_curr[b], mask_prev, mask_curr)
        return out_p, out_c

    def motion_bias(self, box_prev, box_curr, mask_prev, mask_curr
                    ) -> jnp.ndarray:
        """Learned motion term [.., Np, Nc] float32 (zero at invalid
        pairs).  Separately callable: the fused Pallas kernel path computes
        this as a batched XLA op and hands it to the kernel as an additive
        link bias (applied before normalisation and new/end pooling, same
        as the XLA path below)."""
        return self.motion(box_prev, box_curr, mask_prev, mask_curr)

    def affinity_link(self, feats_prev: Dict[str, jnp.ndarray],
                      feats_curr: Dict[str, jnp.ndarray],
                      mask_prev, mask_curr, *, train: bool = False
                      ) -> jnp.ndarray:
        """Raw (un-normalised) link scores only — no new/end heads.

        The hybrid y_det pre-solve (tracker/sequence.py::_hybrid_track)
        batches just the correlation matmuls over all T pairs and
        re-derives normalisation + new/end per frame with the exact
        carried masks, so computing them here would be discarded work.

        With ``affinity.motion_dim`` > 0 the learned motion term is added
        here, from the ``"box"`` entries riding the feats dicts — so every
        consumer (training forward, sequential scan, parallel pre-solve,
        both hybrid pre-solves) gets identical motion-aware scores with no
        further plumbing; ghost slots contribute their frozen boxes,
        matching the sequential scan exactly.
        """
        links = []
        for b in self.score_branches:
            if b not in feats_prev or b not in feats_curr:
                continue
            links.append(self.affinity_mods[b](
                feats_prev[b], feats_curr[b], mask_prev, mask_curr,
                train=train))
        link = jnp.sum(jnp.stack(links), axis=0)
        if self.cfg.score_fusion == "avg":
            link = link / len(links)
        if self.cfg.affinity.motion_dim:
            if "box" not in feats_prev or "box" not in feats_curr:
                raise ValueError(
                    "affinity.motion_dim > 0 needs per-detection boxes: "
                    "carry them as feats['box'] (the raw-frames pipeline "
                    "and predict(boxes=...) do; training batches need a "
                    "'boxes' [B, T, N, 4] entry)")
            link = link + self.motion_bias(
                feats_prev["box"], feats_curr["box"], mask_prev, mask_curr
            ).astype(link.dtype)
        return link

    def affinity(self, feats_prev: Dict[str, jnp.ndarray],
                 feats_curr: Dict[str, jnp.ndarray],
                 mask_prev, mask_curr, *, train: bool = False
                 ) -> AffinityOutput:
        link = self.affinity_link(feats_prev, feats_curr, mask_prev,
                                  mask_curr, train=train)
        new, end = self.new_end(feats_prev["fused"], feats_curr["fused"],
                                link, mask_prev, mask_curr, train=train)
        link_norm = normalize_link(link, mask_prev, mask_curr,
                                   self.cfg.affinity.softmax_mode)
        return AffinityOutput(link=link, link_norm=link_norm, new=new,
                              end=end)

    def det_score(self, fused_feat, det_mask):
        s = self.det_head(fused_feat)[..., 0]
        return s * det_mask.astype(s.dtype)

    # ---- training forward over T-frame samples --------------------------
    def __call__(self, batch: Dict[str, jnp.ndarray], *, train: bool = False,
                 compact_capacity: int = 0):
        """Forward over [B, T, N, ...] padded samples.

        ``compact_capacity`` > 0 gathers the valid (batch, frame, slot)
        triples into a dense list of that static size before feature
        extraction, so the conv stack runs only on real detections (KITTI
        batches are ~75% padding).  Gather/scatter are differentiable, and
        MaskedBatchNorm statistics over the compacted set with its `taken`
        mask equal the full-batch masked statistics, so training is
        semantics-preserving.  If more detections are valid than capacity,
        the overflow is dropped AND masked out of ``kept_mask`` (returned
        in the outputs) so the loss ignores them consistently.
        """
        crops = batch.get("crops")
        points = batch.get("points")
        point_mask = batch.get("point_mask")
        det_mask = batch["det_mask"]
        T = det_mask.shape[1]

        kept_mask = None
        if compact_capacity:
            from mmmot_tpu.ops.masking import (compact_indices,
                                               scatter_compact)

            B, T_, N = det_mask.shape
            total = B * T_ * N
            idx, taken = compact_indices(det_mask.reshape(-1),
                                         compact_capacity)

            def g(x):
                return None if x is None else \
                    x.reshape((total,) + x.shape[3:])[idx]

            feats_c = self.extract(g(crops), g(points), g(point_mask),
                                   taken, train=train)
            feats = {k: scatter_compact(v, idx, taken, total).reshape(
                B, T_, N, v.shape[-1]) for k, v in feats_c.items()}
            kept_mask = jnp.zeros((total,), bool).at[idx].set(
                taken).reshape(B, T_, N)
            det_mask = kept_mask
        else:
            feats = self.extract(crops, points, point_mask, det_mask,
                                 train=train)
        if self.cfg.affinity.motion_dim:
            if "boxes" not in batch:
                raise ValueError(
                    "affinity.motion_dim > 0: training batches must carry "
                    "'boxes' [B, T, N, 4] detection boxes (pixel l,t,r,b)")
            feats = dict(feats, box=batch["boxes"].astype(jnp.float32))
        outs = []
        for t in range(T - 1):
            fp = {k: v[:, t] for k, v in feats.items()}
            fc = {k: v[:, t + 1] for k, v in feats.items()}
            outs.append(self.affinity(fp, fc, det_mask[:, t],
                                      det_mask[:, t + 1], train=train))
        stack = lambda xs: jnp.stack(xs, axis=1)
        det = self.det_score(feats["fused"], det_mask)
        out = {
            "link": stack([o.link for o in outs]),
            "link_norm": stack([o.link_norm for o in outs]),
            "new": stack([o.new for o in outs]),
            "end": stack([o.end for o in outs]),
            "det": det,
        }
        if kept_mask is not None:
            out["kept_mask"] = kept_mask
        return out
