"""Online tracker runtime — functional rebuild of the reference
``TrackingModule`` (reference: tracking_model.py -> TrackingModule.predict:
run net on frame pair, build + solve the ILP, assign/propagate track IDs).

Differences by design (TPU-first):

* state is an explicit fixed-shape pytree (:class:`TrackerState`) carried
  through ``lax.scan`` instead of Python object attributes, so whole
  sequences stream on-device;
* the per-frame ILP is solved in-graph (``mmmot_tpu.assoc``), no host
  round-trip;
* ID assignment is a pure function of the association decisions: linked
  detections inherit the matched track's ID, new detections take fresh IDs
  from a carried counter.  Association is strictly adjacent-frame, like the
  reference (terminated tracks are not revived).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mmmot_tpu.assoc import associate
from mmmot_tpu.assoc.cost import Decisions
from mmmot_tpu.config import AssocConfig
from mmmot_tpu.models.tracking_net import TrackingNet


class TrackerState(NamedTuple):
    """Fixed-capacity track registry carried across frames.

    feats:  per-branch prev-frame detection embeddings, dict of [M, D].
    mask:   [M] bool — slots holding matchable tracks (live prev-frame
            detections, plus ghosts when ``revival_window`` > 0).
    ids:    [M] int32 — track ID per slot (-1 for empty slots).
    ages:   [M] int32 — frames since the track was born.
    next_id:scalar int32 — next fresh track ID.
    missed: [M] int32 — frames since the slot last matched (0 = live);
            ``None`` when revival is off (keeps the legacy carry
            structure — no recompiles for existing programs).

    M equals the per-frame detection slot count N, except with revival
    enabled, where M = 2N (N live + N ghost slots).
    """

    feats: Dict[str, jnp.ndarray]
    mask: jnp.ndarray
    ids: jnp.ndarray
    ages: jnp.ndarray
    next_id: jnp.ndarray
    missed: Optional[jnp.ndarray] = None


def init_state(feat_dims: Dict[str, int], num_slots: int,
               dtype=jnp.float32, with_missed: bool = False) -> TrackerState:
    # The "box"/"boxvel" entries (spatial-gate coordinates / ghost-coverage
    # velocities) stay float32 regardless of the compute dtype: bf16 rounds
    # KITTI pixel coordinates (~1e3) to +-4 px, enough to corrupt gate IoUs.
    # "detsc" (frozen det-head confidence for coverage scoring) stays f32 so
    # the coverage_min_score gate compares identical values on every path.
    return TrackerState(
        feats={k: jnp.zeros((num_slots, d),
                            jnp.float32 if k in ("box", "boxvel", "cls",
                                                 "detsc") else dtype)
               for k, d in feat_dims.items()},
        mask=jnp.zeros((num_slots,), bool),
        ids=jnp.full((num_slots,), -1, jnp.int32),
        ages=jnp.zeros((num_slots,), jnp.int32),
        next_id=jnp.int32(0),
        missed=(jnp.zeros((num_slots,), jnp.int32) if with_missed
                else None),
    )


def apply_spatial_gate(link, box_prev, box_curr, cfg: AssocConfig):
    """Optional spatial prior on the link scores (TPU-native addition —
    the reference associates on appearance only).

    ``iou_weight`` adds a soft IoU bonus; ``iou_gate`` forbids pairs below
    the IoU floor outright (the assoc ``NEG`` sentinel, so every solver
    and host oracle agrees).  Boxes are (l, t, r, b); empty slots carry
    zero boxes (IoU 0 against everything) but are already excluded by the
    solver masks.
    """
    from mmmot_tpu.assoc.cost import NEG
    from mmmot_tpu.ops.boxes import pairwise_iou

    iou = pairwise_iou(box_prev.astype(jnp.float32),
                       box_curr.astype(jnp.float32))
    if cfg.iou_weight:
        link = link + jnp.asarray(cfg.iou_weight, link.dtype) * \
            iou.astype(link.dtype)
    if cfg.iou_gate > 0.0:
        link = jnp.where(iou >= cfg.iou_gate, link,
                         jnp.asarray(NEG, link.dtype))
    return link


def apply_class_gate(link, cls_prev, cls_curr):
    """Joint multi-class association (assoc.class_gate): forbid links
    between detections of different class groups via the assoc ``NEG``
    sentinel (TPU-native addition — the reference is single-class per
    run).  ``cls_prev``/``cls_curr`` are [.., N] class-group ids."""
    from mmmot_tpu.assoc.cost import NEG

    same = cls_prev[..., :, None] == cls_curr[..., None, :]
    return jnp.where(same, link, jnp.asarray(NEG, link.dtype))


def assign_ids(state: TrackerState, dec: Decisions, det_mask
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IDs for current detections: inherit on link, fresh on new.

    Returns (ids_curr [N] int32, next_id').  Mirrors the reference's
    ``assign_det_id`` bookkeeping but as a pure function.
    """
    linked = dec.match_curr >= 0
    inherited = jnp.where(linked, state.ids[jnp.maximum(dec.match_curr, 0)],
                          -1)
    order = jnp.cumsum(dec.is_new.astype(jnp.int32)) - 1
    fresh = state.next_id + order
    ids_curr = jnp.where(dec.is_new, fresh, inherited)
    ids_curr = jnp.where(det_mask, ids_curr, -1).astype(jnp.int32)
    next_id = state.next_id + jnp.sum(dec.is_new.astype(jnp.int32))
    return ids_curr, next_id


class TrackingModule:
    """Per-frame online tracking API mirroring the reference's surface.

    ``predict`` consumes one frame of padded detections and returns their
    track IDs plus the updated state.  All array work is jit-compatible; wrap
    calls (or the whole sequence scan) in ``jax.jit``.
    """

    def __init__(self, net: TrackingNet, variables: Any,
                 assoc_cfg: Optional[AssocConfig] = None,
                 use_pallas_affinity: Optional[bool] = None,
                 parallel_assoc: Optional[bool] = None,
                 pallas_interpret: bool = False,
                 hybrid_presolve: Optional[bool] = None):
        from mmmot_tpu.kernels import pallas_supported

        self.net = net
        self.variables = variables
        self.assoc_cfg = assoc_cfg or AssocConfig()
        # Fused Pallas affinity kernel (kernels/affinity_kernel.py): the
        # production path on TPU whenever the config's affinity math is
        # covered (flagship is).  None = auto: on for the TPU backend, off
        # elsewhere (interpret mode exists for CPU tests but is slow).
        if use_pallas_affinity is None:
            import jax

            use_pallas_affinity = (jax.default_backend() == "tpu"
                                   and pallas_supported(net.cfg))
        elif use_pallas_affinity and not pallas_supported(net.cfg):
            raise ValueError(
                "pallas affinity kernel does not cover this config "
                "(needs num_layers=2, new_end version>=2); "
                "use use_pallas_affinity=False/None")
        self.use_pallas_affinity = use_pallas_affinity
        self.pallas_interpret = pallas_interpret
        # Parallel association pre-solve (sequence scan): without LP-level
        # det rejection, frame-pair associations depend only on features,
        # never on previous decisions — so all T-1 affinity computations
        # and LP solves batch in parallel and only the (elementwise) ID
        # propagation stays sequential.  With use_det_scores, rejected dets
        # leave the carried state, which feeds the next pair's masks, so
        # the scan must stay fully sequential.  None = auto.
        if parallel_assoc is None:
            parallel_assoc = (not self.assoc_cfg.use_det_scores
                              and not self.assoc_cfg.revival_window)
        if parallel_assoc and self.assoc_cfg.use_det_scores:
            raise ValueError("parallel_assoc is unsound with "
                             "use_det_scores (decision-dependent state)")
        # Track revival (ghost pool) makes the carried state CONTENT
        # decision-dependent — which tracks survive as ghosts depends on
        # the matches — so the plain parallel pre-solve is unsound with it.
        # (The HYBRID pre-solve still works: ghost features are frozen
        # copies of earlier frames, so sequence.py::_revival_track
        # precomputes banded link scores and scans over provenance.)
        if self.assoc_cfg.revival_window and parallel_assoc:
            raise ValueError("parallel_assoc is unsound with "
                             "revival_window (decision-dependent "
                             "ghost pool); hybrid_presolve covers it")
        if self.assoc_cfg.ghost_coverage and \
                not self.assoc_cfg.revival_window:
            raise ValueError("ghost_coverage emits boxes for GHOST slots; "
                             "it needs revival_window > 0")
        self.parallel_assoc = parallel_assoc
        # Hybrid pre-solve (sequence.py _hybrid_track / _revival_track):
        # batch the mask-independent correlation matmuls over all pairs,
        # keep only mask-dependent cheap ops + the LP in the scan.
        # Results identical to the fully sequential scan (tested).
        # UNSOUND with gnn_rounds > 0: message passing attends across the
        # detections of a frame, so features themselves become mask-
        # dependent and the optimistic-mask batching diverges from the
        # sequential scan.  None = auto (on iff sound).
        if hybrid_presolve is None:
            hybrid_presolve = net.cfg.affinity.gnn_rounds == 0
        elif hybrid_presolve and net.cfg.affinity.gnn_rounds:
            raise ValueError(
                "hybrid_presolve is unsound with gnn_rounds > 0 "
                "(message passing makes features mask-dependent); use "
                "hybrid_presolve=None/False")
        self.hybrid_presolve = hybrid_presolve

    @property
    def spatial_gating(self) -> bool:
        """Whether the IoU gate / soft spatial prior is configured — the
        pipeline must then carry per-detection boxes (``feats["box"]``)."""
        return (self.assoc_cfg.iou_gate > 0.0
                or self.assoc_cfg.iou_weight != 0.0)

    @property
    def ghost_coverage(self) -> bool:
        """Whether ghost slots emit extrapolated coverage boxes while a
        track is missing (<= revival_window frames) — the FRAG/FN
        mitigation.  Requires the ghost pool."""
        return bool(self.assoc_cfg.ghost_coverage
                    and self.assoc_cfg.revival_window)

    @property
    def motion_on(self) -> bool:
        """Whether the learned motion affinity is configured
        (``affinity.motion_dim`` > 0) — the link scores then include a
        trained box-geometry term (models/affinity.py::MotionScore)."""
        return self.net.cfg.affinity.motion_dim > 0

    @property
    def carry_boxes(self) -> bool:
        """Whether the pipeline must carry per-detection boxes
        (``feats["box"]``): the spatial gate reads them, ghost coverage
        both reads them and derives per-track velocities, and the learned
        motion affinity scores them."""
        return self.spatial_gating or self.ghost_coverage or self.motion_on

    @property
    def class_gating(self) -> bool:
        """Joint multi-class association — the pipeline must then carry
        per-detection class-group ids (``feats["cls"]``)."""
        return self.assoc_cfg.class_gate

    def extract(self, crops, points, point_mask, det_mask):
        if "quant_int8" in self.variables:
            # Int8-quantized appearance trunk (models/quantize.py): the
            # quant pytree rides the variables dict, so jitted window
            # programs need no extra plumbing.  Only the image branch
            # changes; PointNet + fusion stay the ordinary flax path.
            from mmmot_tpu.models.quantize import quantized_appearance_apply
            from mmmot_tpu.models.tracking_net import _dtype

            quant = self.variables["quant_int8"]
            variables = {k: v for k, v in self.variables.items()
                         if k != "quant_int8"}
            img_feat = None
            if self.net.cfg.use_image and crops is not None:
                img_feat = quantized_appearance_apply(
                    quant, variables, self.net.cfg.appearance, crops,
                    det_mask, dtype=_dtype(self.net.cfg.compute_dtype))
            return self.net.apply(variables, img_feat, points, point_mask,
                                  det_mask, train=False,
                                  method=self.net.extract_given_image)
        return self.net.apply(self.variables, crops, points, point_mask,
                              det_mask, train=False, method=self.net.extract)

    def make_state0(self, feat_dims: Dict[str, int],
                    num_dets: int) -> TrackerState:
        """Zero TrackerState sized for this module's configuration:
        ``num_dets`` slots, doubled to hold the ghost pool (and carrying
        the ``missed`` counters) when ``revival_window`` > 0."""
        if self.assoc_cfg.revival_window:
            return init_state(feat_dims, 2 * num_dets, with_missed=True)
        return init_state(feat_dims, num_dets)

    def init_state(self, num_slots: int,
                   dead_sensor: str | None = None) -> TrackerState:
        """Zero TrackerState whose feats pytree matches what the forward
        will produce — with ``dead_sensor`` set, the dead modality's
        branch is absent (a mismatched carry structure breaks lax.scan
        and forces window-program recompiles)."""
        c = self.net.cfg
        dims = {"fused": c.fusion.out_dim}
        if c.fusion.keep_single and c.use_image and c.use_lidar:
            if dead_sensor != "camera":
                dims["image"] = c.appearance.out_dim
            if dead_sensor != "lidar":
                dims["lidar"] = c.point.out_dim
        if self.carry_boxes:
            dims["box"] = 4
        if self.ghost_coverage:
            dims["boxvel"] = 4
            dims["detsc"] = 1   # frozen det-head confidence (coverage score)
        if self.class_gating:
            dims["cls"] = 1
        return self.make_state0(dims, num_slots)

    def _affinity_pallas(self, feats_prev, feats_curr, mask_prev, mask_curr):
        """Fused-kernel affinity (inference): correlation + link heads for
        every live branch, new/end heads, and dual-softmax normalisation in
        ONE Pallas kernel emitting the full association cost tensor
        (kernels/affinity_kernel.py — the BASELINE.json north star).

        Accepts per-frame feats ([N, D]) or batched pair feats
        ([T, N, D]); composes with vmap (sequence batching).
        """
        from mmmot_tpu.kernels import build_affinity_params, pallas_affinity
        from mmmot_tpu.models.tracking_net import AffinityOutput, score_branches

        cfg = self.net.cfg
        gnn = bool(cfg.affinity.gnn_rounds)
        if gnn:
            # Message passing composes with the kernel: the hops run as
            # batched XLA ops (net.gnn_refine) and the kernel consumes the
            # REFINED embeddings for the correlation/link math (which is
            # GNN-independent).  The new/end heads consume the RAW fused
            # embeddings in the XLA architecture (TrackingNet.affinity
            # applies them outside AffinityModule), so they are re-derived
            # below from the kernel's link output — they are [N, D] MLPs,
            # noise next to the pairwise correlation.
            raw_fused_p = feats_prev["fused"]
            raw_fused_c = feats_curr["fused"]
            feats_prev, feats_curr = self.net.apply(
                self.variables, feats_prev, feats_curr, mask_prev,
                mask_curr, method=self.net.gnn_refine)
        branches = tuple(b for b in score_branches(cfg)
                         if b in feats_prev and b in feats_curr)
        if not branches:
            raise ValueError(
                f"no affinity branch of {score_branches(cfg)} present in "
                f"feats {sorted(feats_prev)}")
        cdt = feats_prev["fused"].dtype
        a = jnp.stack([feats_prev[b].astype(cdt) for b in branches],
                      axis=-3)
        b = jnp.stack([feats_curr[b].astype(cdt) for b in branches],
                      axis=-3)
        bias = None
        if self.motion_on:
            # Learned motion affinity: the tiny box-geometry MLP runs as a
            # batched XLA op and enters the kernel as an additive link
            # bias (applied before normalisation/new-end pooling, exactly
            # where TrackingNet.affinity_link adds it on the XLA path).
            if "box" not in feats_prev or "box" not in feats_curr:
                raise ValueError(
                    "affinity.motion_dim > 0 needs per-detection boxes: "
                    "carry them as feats['box'] (the raw-frames pipeline "
                    "and predict(boxes=...) do)")
            bias = self.net.apply(
                self.variables, feats_prev["box"], feats_curr["box"],
                mask_prev, mask_curr, method=self.net.motion_bias)
        unbatched = a.ndim == 3
        if unbatched:
            a, b = a[None], b[None]
            mask_prev, mask_curr = mask_prev[None], mask_curr[None]
            bias = None if bias is None else bias[None]
        params = build_affinity_params(self.variables, cfg, branches, cdt)
        link, link_norm, new, end = pallas_affinity(
            a, b, mask_prev, mask_curr, params, link_bias=bias,
            ops=cfg.affinity.correlation_ops, pool=cfg.new_end.pool,
            softmax_mode=cfg.affinity.softmax_mode,
            avg=cfg.score_fusion == "avg",
            interpret=self.pallas_interpret)
        if unbatched:
            link, link_norm = link[0], link_norm[0]
            new, end = new[0], end[0]
        if gnn:
            def _ne(net, fp, fc, l, mp, mc):
                return net.new_end(fp, fc, l, mp, mc, train=False)

            new, end = self.net.apply(
                self.variables, raw_fused_p, raw_fused_c, link,
                mask_prev[0] if unbatched else mask_prev,
                mask_curr[0] if unbatched else mask_curr, method=_ne)
        return AffinityOutput(link=link, link_norm=link_norm, new=new,
                              end=end)

    def affinity(self, feats_prev, feats_curr, mask_prev, mask_curr):
        """Cross-frame affinity: fused Pallas kernel when enabled, XLA
        modules otherwise.  Shared by the sequential scan and the batched
        parallel pre-solve."""
        if self.use_pallas_affinity:
            return self._affinity_pallas(feats_prev, feats_curr, mask_prev,
                                         mask_curr)
        return self.net.apply(self.variables, feats_prev, feats_curr,
                              mask_prev, mask_curr, train=False,
                              method=self.net.affinity)

    def affinity_link(self, feats_prev, feats_curr, mask_prev, mask_curr):
        """Raw link scores only, for the hybrid y_det pre-solve.

        On the XLA path this skips the new/end heads and normalisation
        (they are re-derived per frame with the exact carried masks); the
        fused Pallas kernel computes everything in one VMEM-resident pass
        anyway, so its link output is simply reused.
        """
        if self.use_pallas_affinity:
            return self._affinity_pallas(feats_prev, feats_curr, mask_prev,
                                         mask_curr).link
        return self.net.apply(self.variables, feats_prev, feats_curr,
                              mask_prev, mask_curr, train=False,
                              method=self.net.affinity_link)

    def step_from_feats(self, state: TrackerState,
                        feats: Dict[str, jnp.ndarray], det_mask
                        ) -> Tuple[TrackerState, Dict[str, jnp.ndarray]]:
        """Associate pre-extracted current-frame features against the state.

        With ``revival_window`` K > 0 the state carries a ghost pool
        (state slots M = 2N): unmatched tracks stay matchable for up to K
        frames and a later detection matching a ghost REVIVES its ID.
        Per-detection outputs (``ids``/``det_score``) are returned at the
        input slot count N; ``decisions`` spans the padded M slots.
        """
        K = self.assoc_cfg.revival_window
        n_in = det_mask.shape[-1]
        if K:
            pad = state.mask.shape[-1] - n_in
            if pad:
                feats = {k: jnp.pad(v, ((0, pad), (0, 0)))
                         for k, v in feats.items()}
                det_mask = jnp.pad(det_mask, (0, pad))
        aff = self.affinity(state.feats, feats, state.mask, det_mask)
        link = aff.link_norm
        if self.spatial_gating:
            if "box" not in feats:
                raise ValueError(
                    "iou_gate/iou_weight need per-detection boxes: carry "
                    "them as feats['box'] (the raw-frames pipeline and "
                    "predict(boxes=...) do; the crops-only track_sequence "
                    "path needs its boxes argument)")
            gate_prev = state.feats["box"]
            if self.assoc_cfg.gate_predict:
                # Motion-predicted gating: compare against each track's
                # constant-velocity PREDICTED box at the current frame.
                # A slot frozen at its last match, missed m frames, is
                # m + 1 frames behind the current frame (live slots have
                # m = 0: a one-step prediction).
                gate_prev = gate_prev + (
                    state.missed[..., None].astype(jnp.float32) + 1.0
                ) * state.feats["boxvel"]
            link = apply_spatial_gate(link, gate_prev,
                                      feats["box"], self.assoc_cfg)
        if self.class_gating:
            if "cls" not in feats:
                raise ValueError(
                    "class_gate needs per-detection class ids: carry them "
                    "as feats['cls'] (the KITTI paths do via det_cls)")
            link = apply_class_gate(link, state.feats["cls"][..., 0],
                                    feats["cls"][..., 0])
        raw = self.assoc_cfg.raw_new_end
        new_s = aff.new if raw else jax.nn.sigmoid(aff.new)
        end_s = aff.end if raw else jax.nn.sigmoid(aff.end)
        det_logit_curr = self.net.apply(
            self.variables, feats["fused"], det_mask,
            method=self.net.det_score)
        if self.assoc_cfg.use_det_scores:
            # Detection-confidence variables in the LP (reference ILP
            # ``y_det``): the solver may reject low-confidence dets instead
            # of explaining every one.  Raw logits (log-odds; negative =
            # likely FP) give the reject arm teeth.
            w = self.assoc_cfg.det_score_weight
            det_logit_prev = self.net.apply(
                self.variables, state.feats["fused"], state.mask,
                method=self.net.det_score)
            dec = associate(link, new_s, end_s, state.mask, det_mask,
                            self.assoc_cfg,
                            det_prev=w * det_logit_prev.astype(link.dtype),
                            det_curr=w * det_logit_curr.astype(link.dtype))
            kept_mask = det_mask & dec.keep_curr
        else:
            dec = associate(link, new_s, end_s, state.mask, det_mask,
                            self.assoc_cfg)
            kept_mask = det_mask
        ids_curr, next_id = assign_ids(state, dec, det_mask)

        matched_prev_age = jnp.where(
            dec.match_curr >= 0, state.ages[jnp.maximum(dec.match_curr, 0)],
            0)
        ages_curr = jnp.where(kept_mask, matched_prev_age + 1, 0).astype(
            jnp.int32)
        if self.ghost_coverage:
            # Per-track constant-velocity estimate from the last link:
            # carried alongside the frozen box so a ghost's coverage box
            # extrapolates (frozen_box + missed * vel).  New/unlinked dets
            # get zero velocity (their first coverage box is the last
            # observed box).
            if "box" not in feats:
                raise ValueError(
                    "ghost_coverage needs per-detection boxes: carry them "
                    "as feats['box'] (the raw-frames pipeline and "
                    "predict(boxes=...) do)")
            linked_c = dec.match_curr >= 0
            vel = jnp.where(
                linked_c[..., None],
                feats["box"] - state.feats["box"][
                    jnp.maximum(dec.match_curr, 0)],
                0.0).astype(jnp.float32)
            feats = dict(feats, boxvel=vel)
            if "detsc" not in feats:
                # Frozen det-head confidence, carried so a ghost's coverage
                # rows are scored by the track's LAST live confidence (the
                # batched sequence paths pre-attach this from the batched
                # det head — see sequence._scan_track — so the scan carry
                # reuses those exact values).
                feats["detsc"] = jax.nn.sigmoid(det_logit_curr)[
                    ..., None].astype(jnp.float32)
        if K:
            new_state = self._revival_state(
                state, feats, det_mask, kept_mask, ids_curr, ages_curr,
                next_id, dec, n_in)
        else:
            new_state = TrackerState(
                feats=feats,
                mask=kept_mask,
                ids=ids_curr,
                ages=ages_curr,
                next_id=next_id,
                missed=state.missed,
            )
        det_score = jax.nn.sigmoid(det_logit_curr)
        out = {"ids": ids_curr[..., :n_in], "decisions": dec,
               "det_score": det_score[..., :n_in],
               "link": aff.link, "new": aff.new, "end": aff.end}
        if self.ghost_coverage:
            # Coverage for tracks missing AT THIS FRAME: the state's ghost
            # slots (missed >= 1) extrapolated by their last link velocity.
            # Emission is gated by the operating-point knobs — the ghost
            # stays REVIVABLE for the full window regardless:
            #   coverage_max_miss m: emit only the first m missed frames;
            #   coverage_min_score:  emit only while the track's last
            #                        det-head confidence clears the bar.
            gmask = new_state.mask[..., n_in:]
            gmiss = new_state.missed[..., n_in:]
            gsc = new_state.feats["detsc"][..., n_in:, 0]
            m_cap = self.assoc_cfg.coverage_max_miss or K
            emit = gmask & (gmiss <= m_cap) & \
                (gsc >= self.assoc_cfg.coverage_min_score)
            out["ghost_ids"] = jnp.where(emit, new_state.ids[..., n_in:],
                                         -1).astype(jnp.int32)
            out["ghost_scores"] = jnp.where(emit, gsc, 0.0).astype(
                jnp.float32)
            out["ghost_boxes"] = (
                new_state.feats["box"][..., n_in:, :]
                + gmiss[..., None].astype(jnp.float32)
                * new_state.feats["boxvel"][..., n_in:, :])
        return new_state, out

    def _revival_state(self, state: TrackerState, feats, det_mask,
                       kept_mask, ids_curr, ages_curr, next_id,
                       dec: Decisions, n_in: int) -> TrackerState:
        """Compose the next state with a ghost pool (revival_window K).

        Slots 0..N-1 hold the current frame's detections; slots N..M-1
        hold up to G = M - N ghosts: previously-matchable tracks that went
        unmatched this frame and have missed <= K frames.  Freshest ghosts
        (fewest missed) win the pool; ghosts keep their frozen features,
        IDs and ages, so a later match inherits the original ID.
        """
        K = self.assoc_cfg.revival_window
        M = state.mask.shape[-1]
        G = M - n_in
        missed = state.missed
        matched_prev = dec.match_prev >= 0
        # Candidate ghosts: matchable last step, unmatched now, still
        # within the window after this miss.
        survive = state.mask & ~matched_prev & (missed + 1 <= K)
        # Freshest-first stable selection of up to G survivors (same
        # top_k trick as ops/masking.compact_indices).
        score = jnp.where(survive, K + 1 - missed, 0) * (M + 1) - \
            jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)[:, 0]
        _, gidx = jax.lax.top_k(score, G)
        gtaken = survive[gidx]

        def keep(curr, ghost_src):
            return jnp.concatenate([curr[:n_in], ghost_src[gidx]], axis=0)

        return TrackerState(
            feats={k: keep(v, state.feats[k]) for k, v in feats.items()},
            mask=jnp.concatenate([kept_mask[:n_in], gtaken]),
            ids=jnp.concatenate(
                [ids_curr[:n_in],
                 jnp.where(gtaken, state.ids[gidx], -1).astype(jnp.int32)]),
            ages=jnp.concatenate([ages_curr[:n_in], state.ages[gidx]]),
            next_id=next_id,
            missed=jnp.concatenate(
                [jnp.zeros((n_in,), jnp.int32),
                 jnp.where(gtaken, missed[gidx] + 1, 0).astype(jnp.int32)]),
        )

    def predict(self, state: TrackerState, crops, points, point_mask,
                det_mask, boxes=None, det_cls=None
                ) -> Tuple[TrackerState, Dict[str, jnp.ndarray]]:
        """Full per-frame update (reference: TrackingModule.predict).

        ``boxes`` [N, 4] (l, t, r, b) is required when the spatial gate is
        configured (``iou_gate``/``iou_weight``); ``det_cls`` [N]
        class-group ids when ``class_gate`` is on."""
        feats = self.extract(crops, points, point_mask, det_mask)
        if boxes is not None and self.carry_boxes:
            feats["box"] = jnp.asarray(boxes, jnp.float32)
        if det_cls is not None and self.class_gating:
            feats["cls"] = jnp.asarray(det_cls, jnp.float32)[..., None]
        return self.step_from_feats(state, feats, det_mask)
