"""Whole-sequence tracking via ``lax.scan`` — the streaming TPU pipeline.

Reference behaviour (eval_seq.py: python loop over frames, each with a GPU
forward + host ILP) becomes a single compiled program per sequence batch
(BASELINE.json config 5: "all KITTI-val sequences streamed with padded
detection slots"):

1. feature extraction for ALL frames runs as one batched pass before the
   scan — the conv/matmul FLOPs hit the MXU at full batch (T*N detections),
   instead of per-frame dribbles;
2. the scan body only carries the cheap sequential parts: cross-frame
   affinity, in-graph association, ID bookkeeping;
3. multiple sequences batch with ``vmap`` and shard over the device mesh's
   data axis (see ``mmmot_tpu.parallel``) — embarrassingly parallel.

The raw-frames path is **compact-first**: valid (frame, slot) pairs are
gathered into a dense list *before* any per-detection work, so the crop
resize matmuls and the conv stack only ever run on real detections (KITTI
frames average ~10 valid of N padded slots — compaction is a >2x FLOP cut
at the faithful crop-224 scale).

Padding frames beyond a sequence's true length carry an all-false det mask,
which naturally produces no detections/IDs and leaves the state unchanged
except ages; emitted IDs for invalid slots are -1.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mmmot_tpu.tracker.tracker import TrackingModule


def _compact_indices(det_mask, capacity: int):
    """Valid-first ordering of the flattened [T, N] slot grid (shared core:
    :func:`mmmot_tpu.ops.masking.compact_indices`)."""
    from mmmot_tpu.ops.masking import compact_indices

    return compact_indices(det_mask.reshape(-1), capacity)


def _scatter_feats(feats_c: Dict[str, jnp.ndarray], idx, taken, T: int,
                   N: int) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Scatter compacted [capacity, D] features back to [T, N, D]."""
    from mmmot_tpu.ops.masking import scatter_compact

    feats = {k: scatter_compact(v, idx, taken, T * N).reshape(
        T, N, v.shape[-1]) for k, v in feats_c.items()}
    kept = jnp.zeros((T * N,), bool).at[idx].set(taken)
    return feats, kept.reshape(T, N)


def _chunked(fn, args, capacity: int, chunk: int | None):
    """Run ``fn`` over ``args`` (leading axis = capacity) in chunks.

    Bounds peak activation memory: the conv stack only ever sees ``chunk``
    detections at once (eval-mode BN is per-element, so chunking is exact).
    A non-divisible remainder runs as one extra smaller call (a second
    sub-graph in the same program, not an error).
    """
    if not chunk or capacity <= chunk:
        return fn(args)
    nch, rem = divmod(capacity, chunk)
    head = capacity - rem

    def is_leaf(x):
        return x is None

    def take(x, sl):
        return None if x is None else x[sl]

    def resh(x):
        return (None if x is None
                else x[:head].reshape((nch, chunk) + x.shape[1:]))

    out = jax.lax.map(fn, jax.tree.map(resh, args, is_leaf=is_leaf))
    out = {k: v.reshape((head,) + v.shape[2:]) for k, v in out.items()}
    if rem:
        tail = fn(jax.tree.map(lambda x: take(x, slice(head, None)), args,
                               is_leaf=is_leaf))
        out = {k: jnp.concatenate([v, tail[k]]) for k, v in out.items()}
    return out


def _compact_extract(module: TrackingModule, crops, points, point_mask,
                     det_mask, capacity: int,
                     extract_chunk: int | None = None):
    """Feature-extract only the valid detection slots of padded crops.

    Used when crops are already materialised ([T, N, h, w, 3]).  The
    raw-frames pipeline uses the compact-first path instead (crops are never
    materialised for invalid slots).  If more than ``capacity`` slots are
    valid, the overflow detections are dropped (their det_mask entry is
    cleared in the returned mask) — size capacity generously.
    """
    T, N = det_mask.shape
    capacity = min(capacity, T * N)
    idx, taken = _compact_indices(det_mask, capacity)

    c = (crops.reshape((T * N,) + crops.shape[2:])[idx]
         if crops is not None else None)
    p = (points.reshape((T * N,) + points.shape[2:])[idx]
         if points is not None else None)
    pm = (point_mask.reshape((T * N,) + point_mask.shape[2:])[idx]
          if point_mask is not None else None)

    def ex(args):
        c_, p_, pm_, m_ = args
        return module.extract(c_, p_, pm_, m_)

    feats_c = _chunked(ex, (c, p, pm, taken), capacity, extract_chunk)
    return _scatter_feats(feats_c, idx, taken, T, N)


def _scan_track(module: TrackingModule, feats: Dict[str, jnp.ndarray],
                det_mask, state0=None):
    """The sequential part: association + ID bookkeeping over frames.

    ``state0`` lets callers stream one long sequence through several
    fixed-size windows (one compiled program regardless of sequence
    length): pass the previous window's final state.  Returns
    (outputs, final_state).

    Two execution strategies with identical results (tested):

    * **parallel pre-solve** (default, ``module.parallel_assoc``): frame-
      pair associations depend only on features, so all T affinity
      computations and LP solves run as ONE batch (big matmuls + one
      vmapped auction); only the elementwise ID propagation scans.  This
      removed the dominant cost of the sequence pipeline (the per-frame
      scan body was 44% of runtime at the faithful benchmark scale).
    * **hybrid pre-solve** (``use_det_scores`` with ``hybrid_presolve``,
      the default): LP det rejection makes the carried state decision-
      dependent, but only through the MASK — so the correlation matmuls
      still batch over all pairs and only cheap mask-dependent ops + the
      LP stay in the scan (:func:`_hybrid_track`).
    * **sequential scan** (``parallel_assoc=False, hybrid_presolve=False``):
      per-frame ``step_from_feats`` — the simple reference-shaped loop,
      kept as the equality oracle for the two above.
    """
    N = det_mask.shape[-1]
    if module.ghost_coverage and "detsc" not in feats:
        # Frozen det-head confidence rides the carried feats so a ghost's
        # coverage rows are scored by its track's LAST live confidence
        # (tracker.step_from_feats emission; coverage_min_score gate).
        # Computed HERE as one batched head call over all frames so every
        # execution strategy (sequential scan / revival hybrid) freezes
        # bit-identical values.
        dl = module.net.apply(module.variables, feats["fused"], det_mask,
                              method=module.net.det_score)
        feats = dict(feats, detsc=jax.nn.sigmoid(dl)[..., None].astype(
            jnp.float32))
    if state0 is None:
        # Build the registry from the branches actually extracted — with a
        # dead sensor (crops/points None) the single-modality branches are
        # absent, and the scan carry must match (sensor-failure operation
        # is a product feature; reference keeps per-modality paths alive).
        # make_state0 sizes the registry for the module (2N slots + missed
        # counters when revival_window > 0).  Ghost coverage additionally
        # carries per-track box velocities.
        dims = {k: v.shape[-1] for k, v in feats.items()}
        if module.ghost_coverage:
            dims["boxvel"] = 4
        state0 = module.make_state0(dims, N)
    cdtype = feats["fused"].dtype
    # "box"/"boxvel" (pixel coordinates) stay f32: bf16 rounds pixel coords.
    state0 = state0._replace(
        feats={k: (v if k in ("box", "boxvel", "cls", "detsc")
                  else v.astype(cdtype))
               for k, v in state0.feats.items()})

    if getattr(module, "parallel_assoc", False):
        return _parallel_track(module, feats, det_mask, state0)
    if module.assoc_cfg.revival_window:
        if getattr(module, "hybrid_presolve", True):
            return _revival_track(module, feats, det_mask, state0)
    elif module.assoc_cfg.use_det_scores and getattr(
            module, "hybrid_presolve", True):
        return _hybrid_track(module, feats, det_mask, state0)

    coverage = module.ghost_coverage

    def step(state, frame):
        f, dm = frame
        state, out = module.step_from_feats(state, f, dm)
        ys = (out["ids"], out["det_score"])
        if coverage:
            ys = ys + (out["ghost_ids"], out["ghost_boxes"],
                       out["ghost_scores"])
        return state, ys

    frames = ({k: v for k, v in feats.items()}, det_mask)
    final, ys = jax.lax.scan(step, state0, frames)
    out = {"ids": ys[0], "det_score": ys[1]}
    if coverage:
        out["ghost_ids"], out["ghost_boxes"] = ys[2], ys[3]
        out["ghost_scores"] = ys[4]
    return out, final


def _parallel_track(module: TrackingModule, feats: Dict[str, jnp.ndarray],
                    det_mask, state0):
    """Batched association pre-solve + elementwise ID-propagation scan.

    Pair t associates frame t against frame t-1 (pair 0 against
    ``state0``, which is empty at a sequence start so everything is new —
    exactly what the sequential scan computes step by step).
    """
    from mmmot_tpu.assoc import associate
    from mmmot_tpu.tracker.tracker import TrackerState

    T, N = det_mask.shape
    net = module.net

    prev_feats = {k: jnp.concatenate([state0.feats[k][None], v[:-1]])
                  for k, v in feats.items()}
    mask_prev = jnp.concatenate([state0.mask[None], det_mask[:-1]])

    # All T frame-pair affinities in one batched call — through the fused
    # Pallas kernel when enabled (grid over pairs), XLA modules otherwise.
    aff = module.affinity(prev_feats, feats, mask_prev, det_mask)
    link = aff.link_norm
    if module.spatial_gating:
        from mmmot_tpu.tracker.tracker import apply_spatial_gate

        link = apply_spatial_gate(link, prev_feats["box"], feats["box"],
                                  module.assoc_cfg)
    if module.class_gating:
        from mmmot_tpu.tracker.tracker import apply_class_gate

        link = apply_class_gate(link, prev_feats["cls"][..., 0],
                                feats["cls"][..., 0])
    raw = module.assoc_cfg.raw_new_end
    new_s = aff.new if raw else jax.nn.sigmoid(aff.new)
    end_s = aff.end if raw else jax.nn.sigmoid(aff.end)
    dec = associate(link, new_s, end_s, mask_prev, det_mask,
                    module.assoc_cfg)
    det_logit = net.apply(module.variables, feats["fused"], det_mask,
                          method=net.det_score)
    det_score = jax.nn.sigmoid(det_logit)

    def step(carry, x):
        ids_prev, ages_prev, next_id = carry
        match_curr, is_new, dm = x
        linked = match_curr >= 0
        safe = jnp.maximum(match_curr, 0)
        inherited = jnp.where(linked, ids_prev[safe], -1)
        order = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        ids_curr = jnp.where(is_new, next_id + order, inherited)
        ids_curr = jnp.where(dm, ids_curr, -1).astype(jnp.int32)
        matched_age = jnp.where(linked, ages_prev[safe], 0)
        ages_curr = jnp.where(dm, matched_age + 1, 0).astype(jnp.int32)
        next_id = next_id + jnp.sum(is_new.astype(jnp.int32))
        return (ids_curr, ages_curr, next_id), ids_curr

    (ids_last, ages_last, next_id), ids = jax.lax.scan(
        step, (state0.ids, state0.ages, state0.next_id),
        (dec.match_curr, dec.is_new, det_mask))

    final = TrackerState(
        feats={k: v[-1] for k, v in feats.items()},
        mask=det_mask[-1], ids=ids_last, ages=ages_last, next_id=next_id)
    return {"ids": ids, "det_score": det_score}, final


def _hybrid_track(module: TrackingModule, feats: Dict[str, jnp.ndarray],
                  det_mask, state0):
    """Hybrid pre-solve for the y_det (full-ILP) mode.

    LP-level detection rejection makes the carried state decision-
    dependent — but only through the MASK: the carried features are the
    full previous-frame features regardless of rejections, and every
    mask application downstream is multiplicative (score * 0/1) or a
    masked reduction.  So the expensive mask-independent work — the
    per-branch correlation matmuls (the GFLOPs) and the det head —
    batches over all T pairs with OPTIMISTIC masks (the full det_mask),
    and the scan body re-masks exactly with the carried kept-mask and
    keeps only the cheap parts: normalisation, new/end heads, the LP
    solve, and ID bookkeeping.  Results are identical to the fully
    sequential ``step_from_feats`` scan (tested).

    Rejections only ever SHRINK the prev mask below det_mask, and raw
    link scores are already zeroed at invalid optimistic pairs, so
    re-masking with the smaller true mask is exact.
    """
    from mmmot_tpu.assoc import associate
    from mmmot_tpu.models.affinity import normalize_link
    from mmmot_tpu.tracker.tracker import TrackerState
    from mmmot_tpu.ops.masking import pair_mask

    net = module.net
    w = module.assoc_cfg.det_score_weight

    prev_feats = {k: jnp.concatenate([state0.feats[k][None], v[:-1]])
                  for k, v in feats.items()}
    mask_prev_opt = jnp.concatenate([state0.mask[None], det_mask[:-1]])

    # Batched heavy work (optimistic masks): raw link scores + det logits.
    # Link-only: normalisation and the new/end heads are re-derived per
    # frame in the scan with the exact carried masks, so the full affinity
    # outputs would be discarded work here.
    link_all = module.affinity_link(prev_feats, feats, mask_prev_opt,
                                    det_mask)
    det_logit = net.apply(module.variables, feats["fused"], det_mask,
                          method=net.det_score)                # [T, N]
    det_logit0 = net.apply(module.variables, state0.feats["fused"],
                           state0.mask, method=net.det_score)  # [N]
    det_logit_prev_full = jnp.concatenate([det_logit0[None],
                                           det_logit[:-1]])

    def _new_end(net, fp, fc, l, mp, mc):
        return net.new_end(fp, fc, l, mp, mc, train=False)

    gating = module.spatial_gating
    clsing = module.class_gating

    def step(carry, x):
        mp, ids_prev, ages_prev, next_id = carry
        link_raw, fp_fused, fc_fused, dlp_full, dl_curr, dm = x[:6]
        rest = list(x[6:])
        box_prev = box_curr = cls_prev = cls_curr = None
        if gating:
            box_prev, box_curr = rest[0], rest[1]
            rest = rest[2:]
        if clsing:
            cls_prev, cls_curr = rest[0], rest[1]
        pm = pair_mask(mp, dm)
        link = link_raw * pm.astype(link_raw.dtype)
        link_norm = normalize_link(link, mp, dm,
                                   net.cfg.affinity.softmax_mode)
        if gating:
            from mmmot_tpu.tracker.tracker import apply_spatial_gate

            link_norm = apply_spatial_gate(link_norm, box_prev, box_curr,
                                           module.assoc_cfg)
        if clsing:
            from mmmot_tpu.tracker.tracker import apply_class_gate

            link_norm = apply_class_gate(link_norm, cls_prev[..., 0],
                                         cls_curr[..., 0])
        new, end = net.apply(module.variables, fp_fused, fc_fused, link,
                             mp, dm, method=_new_end)
        raw = module.assoc_cfg.raw_new_end
        dec = associate(link_norm, new if raw else jax.nn.sigmoid(new),
                        end if raw else jax.nn.sigmoid(end),
                        mp, dm, module.assoc_cfg,
                        det_prev=(w * (dlp_full * mp.astype(
                            dlp_full.dtype))).astype(link.dtype),
                        det_curr=(w * dl_curr).astype(link.dtype))
        kept = dm & dec.keep_curr
        linked = dec.match_curr >= 0
        safe = jnp.maximum(dec.match_curr, 0)
        inherited = jnp.where(linked, ids_prev[safe], -1)
        order = jnp.cumsum(dec.is_new.astype(jnp.int32)) - 1
        ids_curr = jnp.where(dec.is_new, next_id + order, inherited)
        ids_curr = jnp.where(dm, ids_curr, -1).astype(jnp.int32)
        matched_age = jnp.where(linked, ages_prev[safe], 0)
        ages_curr = jnp.where(kept, matched_age + 1, 0).astype(jnp.int32)
        next_id = next_id + jnp.sum(dec.is_new.astype(jnp.int32))
        return ((kept, ids_curr, ages_curr, next_id),
                (ids_curr, jax.nn.sigmoid(dl_curr)))

    (mask_last, ids_last, ages_last, next_id), (ids, det_score) = \
        jax.lax.scan(step,
                     (state0.mask, state0.ids, state0.ages, state0.next_id),
                     (link_all, prev_feats["fused"], feats["fused"],
                      det_logit_prev_full, det_logit, det_mask)
                     + ((prev_feats["box"], feats["box"]) if gating
                        else ())
                     + ((prev_feats["cls"], feats["cls"]) if clsing
                        else ()))
    final = TrackerState(
        feats={k: v[-1] for k, v in feats.items()},
        mask=mask_last, ids=ids_last, ages=ages_last, next_id=next_id)
    return {"ids": ids, "det_score": det_score}, final


def _revival_track(module: TrackingModule, feats: Dict[str, jnp.ndarray],
                   det_mask, state0):
    """Hybrid pre-solve for the ghost-pool revival mode (revival_window K).

    The carried state's CONTENT is decision-dependent (which tracks survive
    as ghosts depends on the matches), which is why the plain parallel
    pre-solve is unsound here — but every ghost's features are a FROZEN COPY
    of some earlier frame's detection features.  A ghost alive at frame t
    has missed m <= K frames, so its source frame is t-1-m in [t-K-1, t-1]:
    every link score the scan can ever need is one of

        band[d][t] = link(feats[t-d], feats[t]),  d = 1..K+1   (this window)
        entry[t]   = link(state0.feats, feats[t]), t = 0..K    (carried-in
                     slots from the previous window, live + ghosts)

    all of which are mask-independent (raw link scores are zeroed at
    invalid pairs, and masks only ever shrink — the same exactness argument
    as :func:`_hybrid_track`; requires ``gnn_rounds == 0``, enforced by
    ``TrackingModule``).  So the K+2 banded affinity computations batch over
    all T frames (big MXU matmuls / fused-kernel grids), and the scan body
    carries only per-slot PROVENANCE indices and does cheap gathers, the
    new/end heads, normalisation and the LP solve.  Results are identical
    to the fully sequential ``step_from_feats`` scan (tested).
    """
    from mmmot_tpu.assoc import associate
    from mmmot_tpu.models.affinity import normalize_link
    from mmmot_tpu.ops.masking import pair_mask
    from mmmot_tpu.tracker.tracker import (TrackerState, apply_class_gate,
                                           apply_spatial_gate)

    net = module.net
    cfg = module.assoc_cfg
    K = cfg.revival_window
    T, N = det_mask.shape
    M = state0.mask.shape[-1]
    G = M - N
    Dd = K + 1                          # max reach-back of a matchable slot
    gating = module.spatial_gating
    coverage = module.ghost_coverage
    clsing = module.class_gating
    need_box = gating or coverage
    use_det = cfg.use_det_scores
    raw = cfg.raw_new_end
    w = cfg.det_score_weight
    cdt = feats["fused"].dtype

    # ---- batched heavy work (optimistic masks) --------------------------
    bands = []
    for d in range(1, Dd + 1):
        if d >= T:
            bands.append(jnp.zeros((T, N, N), cdt))
            continue
        fp = {k: jnp.concatenate([jnp.zeros((d,) + v.shape[1:], v.dtype),
                                  v[:-d]]) for k, v in feats.items()}
        mp = jnp.concatenate([jnp.zeros((d, N), bool), det_mask[:-d]])
        bands.append(module.affinity_link(fp, feats, mp, det_mask))
    bands = jnp.stack(bands, axis=1)                   # [T, Dd, N, N]

    # Entry band: carried-in slots (prev window's live dets + ghosts) stay
    # matchable for at most Dd initial frames of this window.
    E = min(Dd, T)

    def pad_curr(x):
        widths = [(0, 0)] * x.ndim
        widths[1] = (0, G)
        return jnp.pad(x, widths)

    f0 = {k: jnp.broadcast_to(state0.feats[k][None],
                              (E,) + state0.feats[k].shape)
          for k in feats}
    fcE = {k: pad_curr(v[:E]) for k, v in feats.items()}
    m0 = jnp.broadcast_to(state0.mask[None], (E, M))
    mcE = pad_curr(det_mask[:E])
    entry = module.affinity_link(f0, fcE, m0, mcE)[..., :N]    # [E, M, N]
    entry_full = jnp.zeros((T, M, N), entry.dtype).at[:E].set(entry)
    bank = jnp.concatenate([bands.reshape(T, Dd * N, N), entry_full],
                           axis=1)                     # [T, Dd*N + M, N]

    det_all = net.apply(module.variables, feats["fused"], det_mask,
                        method=net.det_score)          # [T, N]
    det0 = net.apply(module.variables, state0.feats["fused"], state0.mask,
                     method=net.det_score)             # [M]

    # Flat per-slot banks (window slots first, then the M state0 slots):
    # provenance index src in [0, T*N + M) addresses them all.
    def flat(x_win, x0):
        return jnp.concatenate(
            [x_win.reshape((T * N,) + x_win.shape[2:]),
             x0.astype(x_win.dtype)])

    ffl = flat(feats["fused"], state0.feats["fused"])
    dfl = flat(det_all, det0)
    bfl = flat(feats["box"], state0.feats["box"]) if need_box else None
    cfl = flat(feats["cls"], state0.feats["cls"]) if clsing else None
    # Frozen det-head confidences by provenance (coverage-row scoring /
    # coverage_min_score gate) — attached by _scan_track, f32.
    scfl = (flat(feats["detsc"], state0.feats["detsc"])[..., 0]
            if coverage else None)

    def _new_end(net, fp, fc, l, mp, mc):
        return net.new_end(fp, fc, l, mp, mc, train=False)

    iota_m = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)[:, 0]
    arange_n = jnp.arange(N, dtype=jnp.int32)

    def step(carry, x):
        if coverage:
            mask, ids, ages, next_id, missed, src, vel = carry
        else:
            mask, ids, ages, next_id, missed, src = carry
        bank_t, fc_f, det_c, dm, tt = x[:5]
        rest = list(x[5:])
        box_t = cls_t = None
        if need_box:
            box_t = rest[0]
            rest = rest[1:]
        if clsing:
            cls_t = rest[0]
        # Gather this frame's prev-side link rows by provenance.
        in_win = src < T * N
        src_k = src % N
        d = tt - src // N                     # 1..Dd for in-window slots
        row_idx = jnp.where(in_win, (d - 1) * N + src_k,
                            Dd * N + (src - T * N))
        row_idx = jnp.clip(row_idx, 0, bank_t.shape[0] - 1)
        link_rows = bank_t[row_idx]                        # [M, N]
        fp_f = ffl[src]                                    # [M, D]
        dlp = dfl[src]                                     # [M]

        dm_pad = jnp.pad(dm, (0, G))
        fc_pad = jnp.pad(fc_f, ((0, G), (0, 0)))
        det_c_pad = jnp.pad(det_c, (0, G))
        pm = pair_mask(mask, dm_pad)
        link = jnp.pad(link_rows, ((0, 0), (0, G))) * pm.astype(cdt)
        link_norm = normalize_link(link, mask, dm_pad,
                                   net.cfg.affinity.softmax_mode)
        if gating:
            gate_prev = bfl[src]
            if cfg.gate_predict:
                # Motion-predicted gating (tracker.step_from_feats): the
                # carried velocity + missed counter extrapolate each
                # slot's frozen box to the current frame.
                gate_prev = gate_prev + (
                    missed[:, None].astype(jnp.float32) + 1.0) * vel
            link_norm = apply_spatial_gate(
                link_norm, gate_prev, jnp.pad(box_t, ((0, G), (0, 0))),
                cfg)
        if clsing:
            link_norm = apply_class_gate(
                link_norm, cfl[src][..., 0],
                jnp.pad(cls_t, ((0, G), (0, 0)))[..., 0])
        new, end = net.apply(module.variables, fp_f, fc_pad, link, mask,
                             dm_pad, method=_new_end)
        new_s = new if raw else jax.nn.sigmoid(new)
        end_s = end if raw else jax.nn.sigmoid(end)
        if use_det:
            dec = associate(link_norm, new_s, end_s, mask, dm_pad, cfg,
                            det_prev=w * dlp.astype(link.dtype),
                            det_curr=w * det_c_pad.astype(link.dtype))
            kept = dm_pad & dec.keep_curr
        else:
            dec = associate(link_norm, new_s, end_s, mask, dm_pad, cfg)
            kept = dm_pad
        # ID / age bookkeeping (tracker.assign_ids, inlined over the carry).
        linked = dec.match_curr >= 0
        safe = jnp.maximum(dec.match_curr, 0)
        inherited = jnp.where(linked, ids[safe], -1)
        order = jnp.cumsum(dec.is_new.astype(jnp.int32)) - 1
        ids_curr = jnp.where(dec.is_new, next_id + order, inherited)
        ids_curr = jnp.where(dm_pad, ids_curr, -1).astype(jnp.int32)
        matched_age = jnp.where(linked, ages[safe], 0)
        ages_curr = jnp.where(kept, matched_age + 1, 0).astype(jnp.int32)
        next_id = next_id + jnp.sum(dec.is_new.astype(jnp.int32))
        # Ghost pool (tracker._revival_state, provenance instead of feats).
        matched_prev = dec.match_prev >= 0
        survive = mask & ~matched_prev & (missed + 1 <= K)
        score = jnp.where(survive, K + 1 - missed, 0) * (M + 1) - iota_m
        _, gidx = jax.lax.top_k(score, G)
        gtaken = survive[gidx]
        ids_g = jnp.where(gtaken, ids[gidx], -1).astype(jnp.int32)
        missed_g = jnp.where(gtaken, missed[gidx] + 1, 0).astype(jnp.int32)
        carry2 = (
            jnp.concatenate([kept[:N], gtaken]),
            jnp.concatenate([ids_curr[:N], ids_g]),
            jnp.concatenate([ages_curr[:N], ages[gidx]]),
            next_id,
            jnp.concatenate([jnp.zeros((N,), jnp.int32), missed_g]),
            jnp.concatenate([tt * N + arange_n, src[gidx]]),
        )
        ys = (ids_curr[:N], jax.nn.sigmoid(det_c))
        if coverage:
            # Velocity from this frame's links (tracker.step_from_feats);
            # ghosts keep the velocity frozen at their last match.
            box_c_pad = jnp.pad(box_t, ((0, G), (0, 0)))
            velc = jnp.where(linked[:, None],
                             box_c_pad - bfl[src][safe],
                             0.0).astype(jnp.float32)
            carry2 = carry2 + (
                jnp.concatenate([velc[:N], vel[gidx]]),)
            # Coverage emission: ghosts missing at THIS frame, frozen box
            # extrapolated by missed * vel — gated by the operating-point
            # knobs exactly like tracker.step_from_feats (bit-equal).
            gsc = scfl[src[gidx]]
            m_cap = cfg.coverage_max_miss or K
            emit = gtaken & (missed_g <= m_cap) & \
                (gsc >= cfg.coverage_min_score)
            gbox = (bfl[src[gidx]]
                    + missed_g[:, None].astype(jnp.float32) * vel[gidx])
            ys = ys + (jnp.where(emit, ids_g, -1).astype(jnp.int32), gbox,
                       jnp.where(emit, gsc, 0.0).astype(jnp.float32))
        return carry2, ys

    missed0 = (state0.missed if state0.missed is not None
               else jnp.zeros((M,), jnp.int32))
    src0 = T * N + jnp.arange(M, dtype=jnp.int32)
    carry0 = (state0.mask, state0.ids, state0.ages, state0.next_id,
              missed0, src0)
    if coverage:
        carry0 = carry0 + (jnp.asarray(
            state0.feats.get("boxvel", jnp.zeros((M, 4))), jnp.float32),)
    xs = (bank, feats["fused"], det_all, det_mask,
          jnp.arange(T, dtype=jnp.int32))
    if need_box:
        xs = xs + (feats["box"],)
    if clsing:
        xs = xs + (feats["cls"],)
    carry_f, ys = jax.lax.scan(step, carry0, xs)
    mask_f, ids_f, ages_f, next_id_f, missed_f, src_f = carry_f[:6]
    final_feats = {k: flat(feats[k], state0.feats[k])[src_f] for k in feats}
    out = {"ids": ys[0], "det_score": ys[1]}
    if coverage:
        final_feats["boxvel"] = carry_f[6]
        out["ghost_ids"], out["ghost_boxes"] = ys[2], ys[3]
        out["ghost_scores"] = ys[4]
    final = TrackerState(
        feats=final_feats,
        mask=mask_f, ids=ids_f, ages=ages_f, next_id=next_id_f,
        missed=missed_f)
    return out, final


def track_sequence(module: TrackingModule, crops, points, point_mask,
                   det_mask, compact_capacity: int | None = None,
                   extract_chunk: int | None = None, boxes=None,
                   det_cls=None) -> Dict[str, jnp.ndarray]:
    """Track one sequence of ``T`` frames of padded detections.

    crops [T, N, H, W, 3] (or None), points [T, N, P, C] (or None),
    point_mask [T, N, P], det_mask [T, N].  Returns {"ids": [T, N] int32,
    "det_score": [T, N], "n_dropped": scalar int32} — ``n_dropped`` counts
    valid detections discarded because ``compact_capacity`` was too small
    (always 0 when compaction is off; assert on it upstream).

    ``compact_capacity``: if set, feature extraction runs only on valid
    slots via :func:`_compact_extract` (big conv-FLOP saving at KITTI
    densities); must be >= the max number of valid slots in the sequence.
    """
    n_valid = jnp.sum(det_mask.astype(jnp.int32))
    if compact_capacity is not None:
        feats, det_mask = _compact_extract(module, crops, points,
                                           point_mask, det_mask,
                                           compact_capacity,
                                           extract_chunk=extract_chunk)
    else:
        # One batched feature pass over every (frame, slot).
        feats = module.extract(crops, points, point_mask, det_mask)
    if boxes is not None and module.carry_boxes:
        feats["box"] = jnp.asarray(boxes, jnp.float32)  # [T, N, 4]
    if det_cls is not None and module.class_gating:
        feats["cls"] = jnp.asarray(det_cls, jnp.float32)[..., None]
    out, _ = _scan_track(module, feats, det_mask)
    out["n_dropped"] = n_valid - jnp.sum(det_mask.astype(jnp.int32))
    return out


def track_sequence_from_frames(module: TrackingModule, images, clouds,
                               boxes, det_mask, proj,
                               crop_size: Tuple[int, int],
                               points_per_det: int,
                               cloud_valid=None,
                               compact_capacity: int | None = None,
                               extract_chunk: int | None = None,
                               crop_window: int = 512,
                               state0=None,
                               return_state: bool = False,
                               boxes3d=None,
                               velo_to_rect=None,
                               point_source: str = "frustum",
                               dead_sensor: str | None = None,
                               det_cls=None
                               ) -> Dict[str, jnp.ndarray]:
    """Track one sequence from RAW frames — full on-device preprocessing.

    images [T, H, W, 3] (uint8 or float pixels), clouds [T, M, C] LiDAR
    points, boxes [T, N, 4] detection boxes (pixels), proj [3, 4] camera
    projection.  Per-detection crops and frustum point samples are computed
    in-graph (ops/crop_resize.py, ops/frustum.py) — the reference does this
    on the host per detection (utils/data_util.py, point_cloud/), which is
    exactly the host round-trip the TPU pipeline eliminates.

    With ``compact_capacity`` set this is the **compact-first** pipeline:
    valid detections are gathered up front and the crop-resize matmuls, the
    window slicing, and the conv stack all run on exactly ``capacity``
    detections (chunked by ``extract_chunk`` to bound activation memory).

    ``state0``/``return_state`` support fixed-window streaming: call with
    the previous window's final TrackerState to continue a longer sequence
    through one compiled program (see cli/track.py).
    """
    from mmmot_tpu.ops.crop_resize import (crop_and_resize_batched,
                                           crop_and_resize_gathered,
                                           normalize_crops)
    from mmmot_tpu.ops.frustum import (box3d_sample_batched,
                                       frustum_sample_batched)

    if point_source not in ("frustum", "box3d"):
        raise ValueError(f"unknown point_source {point_source!r}")
    if dead_sensor not in (None, "camera", "lidar"):
        raise ValueError(f"dead_sensor must be camera/lidar, "
                         f"got {dead_sensor!r}")
    use_box3d = point_source == "box3d"
    if use_box3d and boxes3d is None:
        raise ValueError("point_source='box3d' requires boxes3d [T, N, 7]")
    scale = 1.0 / 255.0 if images.dtype == jnp.uint8 else 1.0
    # Sensor-failure robustness on the REAL pipeline (the paper's headline;
    # fusion keeps per-modality branches live): a dead sensor's extraction
    # stage is skipped entirely and the net runs single-modality.
    use_cam = dead_sensor != "camera"
    use_lidar = dead_sensor != "lidar"

    def sample_points(cl, bx2d, bx3d, dm, pv):
        if use_box3d:
            return box3d_sample_batched(
                cl, bx3d, points_per_det, velo_to_rect=velo_to_rect,
                det_mask=dm, point_valid=pv)
        return frustum_sample_batched(
            cl, bx2d, proj, points_per_det, det_mask=dm, point_valid=pv)

    if compact_capacity is None:
        points = point_mask = None
        if use_lidar:
            points, point_mask = sample_points(clouds, boxes, boxes3d,
                                               det_mask, cloud_valid)
        crops = None
        if use_cam:
            crops = crop_and_resize_batched(
                images.astype(jnp.float32), boxes, crop_size, det_mask,
                method="mxu")
            crops = normalize_crops(crops, scale=scale)
        feats = module.extract(crops, points, point_mask, det_mask)
        if module.carry_boxes:
            feats["box"] = boxes.astype(jnp.float32)
        if det_cls is not None and module.class_gating:
            feats["cls"] = det_cls.astype(jnp.float32)[..., None]
        out, final = _scan_track(module, feats, det_mask, state0=state0)
        out["n_dropped"] = jnp.int32(0)   # per-slot path never drops
    else:
        T, N = det_mask.shape
        compact_capacity = min(compact_capacity, T * N)
        n_valid = jnp.sum(det_mask.astype(jnp.int32))
        idx, taken = _compact_indices(det_mask, compact_capacity)
        tsel = idx // N
        boxes_c = boxes.reshape(T * N, 4)[idx]
        boxes3d_c = (boxes3d.reshape(T * N, 7)[idx] if use_box3d
                     else jnp.zeros((compact_capacity, 7), jnp.float32))

        def ex(args):
            # Both the crop resize AND the point-membership top_k run only
            # on the compacted valid detections (the per-slot pass was
            # ~10% of pipeline time at KITTI density).
            ts_k, bx_k, b3_k, m_k = args
            crops_k = None
            if use_cam:
                crops_k = crop_and_resize_gathered(
                    images, ts_k, bx_k, crop_size, mask=m_k,
                    window=crop_window)
                crops_k = normalize_crops(crops_k, scale=scale)
            p_k0 = pm_k0 = None
            if use_lidar:
                cl_k = clouds[ts_k]                   # [chunk, M, C]
                cv_k = (cloud_valid[ts_k] if cloud_valid is not None
                        else None)
                p_k, pm_k = sample_points(cl_k, bx_k[:, None, :],
                                          b3_k[:, None, :], m_k[:, None],
                                          cv_k)
                p_k0, pm_k0 = p_k[:, 0], pm_k[:, 0]
            return module.extract(crops_k, p_k0, pm_k0, m_k)

        feats_c = _chunked(ex, (tsel, boxes_c, boxes3d_c, taken),
                           compact_capacity, extract_chunk)
        feats, kept = _scatter_feats(feats_c, idx, taken, T, N)
        if module.carry_boxes:
            feats["box"] = boxes.astype(jnp.float32)
        if det_cls is not None and module.class_gating:
            feats["cls"] = det_cls.astype(jnp.float32)[..., None]
        out, final = _scan_track(module, feats, kept, state0=state0)
        out["n_dropped"] = n_valid - jnp.sum(kept.astype(jnp.int32))
    if return_state:
        return out, final
    return out


def track_sequences_batched(module: TrackingModule, crops, points,
                            point_mask, det_mask, boxes=None
                            ) -> Dict[str, jnp.ndarray]:
    """Track ``S`` sequences at once: inputs have a leading [S] axis.

    vmap over the sequence axis; shard that axis over the mesh's data axis
    for multi-chip streaming (mmmot_tpu.parallel.shard_sequences).
    """
    def one(c, p, pm, dm, bx):
        return track_sequence(module, c, p, pm, dm, boxes=bx)

    in_axes = (0 if crops is not None else None,
               0 if points is not None else None,
               0 if point_mask is not None else None, 0,
               0 if boxes is not None else None)
    return jax.vmap(one, in_axes=in_axes)(crops, points, point_mask,
                                          det_mask, boxes)


def track_sequences_from_frames_batched(module: TrackingModule, images,
                                        clouds, boxes, det_mask, proj,
                                        crop_size: Tuple[int, int],
                                        points_per_det: int,
                                        compact_capacity: int | None = None,
                                        extract_chunk: int | None = None,
                                        crop_window: int = 512
                                        ) -> Dict[str, jnp.ndarray]:
    """Batched raw-frame tracking: leading [S] sequence axis on all inputs.

    This is the flagship streaming pipeline (BASELINE.json config 5): shard
    the S axis over the mesh's data axis for multi-chip scaling.
    """
    def one(im, cl, bx, dm):
        return track_sequence_from_frames(
            module, im, cl, bx, dm, proj, crop_size, points_per_det,
            compact_capacity=compact_capacity, extract_chunk=extract_chunk,
            crop_window=crop_window)

    return jax.vmap(one)(images, clouds, boxes, det_mask)
