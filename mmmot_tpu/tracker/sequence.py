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

Padding frames beyond a sequence's true length carry an all-false det mask,
which naturally produces no detections/IDs and leaves the state unchanged
except ages; emitted IDs for invalid slots are -1.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mmmot_tpu.tracker.tracker import TrackingModule


def _compact_extract(module: TrackingModule, crops, points, point_mask,
                     det_mask, capacity: int,
                     extract_chunk: int | None = None):
    """Feature-extract only the valid detection slots.

    Padded slots waste conv FLOPs (KITTI frames average ~10 valid of N
    padded slots).  This gathers the valid (frame, slot) pairs into a dense
    batch of static size ``capacity``, runs the extractor once, and
    scatters embeddings back to [T, N, D].  If more than ``capacity`` slots
    are valid, the overflow detections are dropped (their det_mask entry is
    cleared in the returned mask) — size capacity generously.
    """
    T, N = det_mask.shape
    flat = det_mask.reshape(-1)
    # Stable valid-first ordering.
    order_score = flat.astype(jnp.int32) * (T * N + 1) - \
        jax.lax.broadcasted_iota(jnp.int32, (T * N, 1), 0)[:, 0]
    _, idx = jax.lax.top_k(order_score, capacity)
    taken = flat[idx]

    c = (crops.reshape((T * N,) + crops.shape[2:])[idx]
         if crops is not None else None)
    p = (points.reshape((T * N,) + points.shape[2:])[idx]
         if points is not None else None)
    pm = (point_mask.reshape((T * N,) + point_mask.shape[2:])[idx]
          if point_mask is not None else None)
    if extract_chunk and capacity > extract_chunk:
        # Bound conv-stage activation memory: run the extractor over chunks
        # sequentially (lax.map -> scan); eval-mode BN is per-element so
        # chunking is exact.
        if capacity % extract_chunk:
            raise ValueError(f"capacity {capacity} not divisible by "
                             f"extract_chunk {extract_chunk}")
        nch = capacity // extract_chunk

        def resh(x):
            return (None if x is None
                    else x.reshape((nch, extract_chunk) + x.shape[1:]))

        def ex(args):
            c_, p_, pm_, m_ = args
            return module.extract(c_, p_, pm_, m_)

        feats_c = jax.lax.map(ex, (resh(c), resh(p), resh(pm), resh(taken)))
        feats_c = {k: v.reshape((capacity,) + v.shape[2:])
                   for k, v in feats_c.items()}
    else:
        feats_c = module.extract(c, p, pm, taken)

    feats = {}
    for k, v in feats_c.items():
        v = v * taken[:, None].astype(v.dtype)
        full = jnp.zeros((T * N, v.shape[-1]), v.dtype).at[idx].set(v)
        feats[k] = full.reshape(T, N, v.shape[-1])
    kept = jnp.zeros((T * N,), bool).at[idx].set(taken)
    return feats, kept.reshape(T, N)


def track_sequence(module: TrackingModule, crops, points, point_mask,
                   det_mask, compact_capacity: int | None = None,
                   extract_chunk: int | None = None
                   ) -> Dict[str, jnp.ndarray]:
    """Track one sequence of ``T`` frames of padded detections.

    crops [T, N, H, W, 3] (or None), points [T, N, P, C] (or None),
    point_mask [T, N, P], det_mask [T, N].  Returns {"ids": [T, N] int32}.

    ``compact_capacity``: if set, feature extraction runs only on valid
    slots via :func:`_compact_extract` (big conv-FLOP saving at KITTI
    densities); must be >= the max number of valid slots in the sequence.
    """
    T, N = det_mask.shape[:2]
    if compact_capacity is not None:
        feats, det_mask = _compact_extract(module, crops, points,
                                           point_mask, det_mask,
                                           compact_capacity,
                                           extract_chunk=extract_chunk)
    else:
        # One batched feature pass over every (frame, slot).
        feats = module.extract(crops, points, point_mask, det_mask)

    state0 = module.init_state(N)
    cdtype = feats["fused"].dtype
    state0 = state0._replace(
        feats={k: v.astype(cdtype) for k, v in state0.feats.items()})

    def step(state, frame):
        f, dm = frame
        state, out = module.step_from_feats(state, f, dm)
        return state, (out["ids"], out["det_score"])

    frames = ({k: v for k, v in feats.items()}, det_mask)
    _, (ids, det_score) = jax.lax.scan(step, state0, frames)
    return {"ids": ids, "det_score": det_score}


def track_sequence_from_frames(module: TrackingModule, images, clouds,
                               boxes, det_mask, proj,
                               crop_size: Tuple[int, int],
                               points_per_det: int,
                               cloud_valid=None,
                               compact_capacity: int | None = None,
                               extract_chunk: int | None = None
                               ) -> Dict[str, jnp.ndarray]:
    """Track one sequence from RAW frames — full on-device preprocessing.

    images [T, H, W, 3] (uint8 or float pixels), clouds [T, M, C] LiDAR
    points, boxes [T, N, 4] detection boxes (pixels), proj [3, 4] camera
    projection.  Per-detection crops and frustum point samples are computed
    in-graph (ops/crop_resize.py, ops/frustum.py) — the reference does this
    on the host per detection (utils/data_util.py, point_cloud/), which is
    exactly the host round-trip the TPU pipeline eliminates.
    """
    from mmmot_tpu.ops.crop_resize import (crop_and_resize_batched,
                                           normalize_crops)
    from mmmot_tpu.ops.frustum import frustum_sample_batched

    crops = crop_and_resize_batched(
        images.astype(jnp.float32), boxes, crop_size, det_mask,
        method="mxu")
    scale = 1.0 / 255.0 if images.dtype == jnp.uint8 else 1.0
    crops = normalize_crops(crops, scale=scale)
    points, point_mask = frustum_sample_batched(
        clouds, boxes, proj, points_per_det, det_mask=det_mask,
        point_valid=cloud_valid)
    return track_sequence(module, crops, points, point_mask, det_mask,
                          compact_capacity=compact_capacity,
                          extract_chunk=extract_chunk)


def track_sequences_batched(module: TrackingModule, crops, points,
                            point_mask, det_mask) -> Dict[str, jnp.ndarray]:
    """Track ``S`` sequences at once: inputs have a leading [S] axis.

    vmap over the sequence axis; shard that axis over the mesh's data axis
    for multi-chip streaming (mmmot_tpu.parallel.shard_sequences).
    """
    def one(c, p, pm, dm):
        return track_sequence(module, c, p, pm, dm)

    in_axes = (0 if crops is not None else None,
               0 if points is not None else None,
               0 if point_mask is not None else None, 0)
    return jax.vmap(one, in_axes=in_axes)(crops, points, point_mask, det_mask)


def track_sequences_from_frames_batched(module: TrackingModule, images,
                                        clouds, boxes, det_mask, proj,
                                        crop_size: Tuple[int, int],
                                        points_per_det: int,
                                        compact_capacity: int | None = None,
                                        extract_chunk: int | None = None
                                        ) -> Dict[str, jnp.ndarray]:
    """Batched raw-frame tracking: leading [S] sequence axis on all inputs.

    This is the flagship streaming pipeline (BASELINE.json config 5): shard
    the S axis over the mesh's data axis for multi-chip scaling.
    """
    def one(im, cl, bx, dm):
        return track_sequence_from_frames(
            module, im, cl, bx, dm, proj, crop_size, points_per_det,
            compact_capacity=compact_capacity, extract_chunk=extract_chunk)

    return jax.vmap(one)(images, clouds, boxes, det_mask)
