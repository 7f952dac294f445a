"""Reusable windowed KITTI tracking runner (shared by the eval CLI and the
training loop's real-data validation).

Sequences of any length run through ONE compiled program: fixed-size
windows of ``window`` frames with the TrackerState carried across windows
(IDs continue seamlessly).  The last window of a sequence is padded with
all-invalid frames.  Valid-slot compaction capacity is quantized to
multiples of 256 so a denser dataset costs at most a couple of extra
compiles, never one per sequence (reference eval_seq.py pays a Python
loop + per-frame host ILP instead; SURVEY.md §3.2).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Sequence

import numpy as np

from mmmot_tpu.config import DataConfig
from mmmot_tpu.tracker.tracker import TrackingModule


def track_kitti_sequences(module: TrackingModule, data_cfg: DataConfig,
                          res_dir: str,
                          sequences: Optional[Sequence[str]] = None,
                          window: int = 64, chunk: int = 64,
                          score_threshold: float = 0.0,
                          evaluate: bool = True,
                          max_frames: Optional[int] = None,
                          log=None) -> Dict:
    """Track KITTI sequences, write result txts, optionally devkit-score.

    Returns a stats dict: n_programs, n_dropped, total_frames, fps, and
    (when ``evaluate``) ``metrics`` (TrackingMetrics) + ``per_sequence``.
    """
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.data.kitti_dataset import KittiTrackingDataset
    from mmmot_tpu.data.kitti_io import (KittiObject,
                                         read_kitti_tracking_labels,
                                         write_kitti_result)
    from mmmot_tpu.eval import TrackingEvaluation

    crop = tuple(data_cfg.crop_size)
    P = data_cfg.point_len
    ds = KittiTrackingDataset(data_cfg, max_cloud_points=32768)
    seqs = list(sequences) if sequences is not None else ds.sequences

    from mmmot_tpu.tracker.sequence import track_sequence_from_frames

    fns = {}            # (window, capacity) -> jitted fn (compile cache)

    use_box3d = data_cfg.point_source == "box3d"

    def window_fn(W, capacity):
        key = (W, capacity)
        if key not in fns:
            def run(im, cl, cv, bx, b3, v2r, dm, pr, st, _cap=capacity):
                return track_sequence_from_frames(
                    module, im, cl, bx, dm, pr, crop, P, cloud_valid=cv,
                    compact_capacity=_cap, extract_chunk=chunk, state0=st,
                    return_state=True, boxes3d=b3, velo_to_rect=v2r,
                    point_source=data_cfg.point_source)

            fns[key] = jax.jit(run)
        return fns[key]

    ev = TrackingEvaluation(cls="car")
    per_seq = {}
    total_frames, t_total, n_dropped = 0, 0.0, 0
    for i, seq in enumerate(seqs):
        arrs = ds.load_sequence(seq, max_frames=max_frames)
        T, N = arrs.det_mask.shape
        # Always the full window: padding frames carry no detections, so
        # compaction makes them nearly free, and every sequence length then
        # shares one compiled program (W = min(window, T) would recompile
        # per distinct short length).
        W = window
        n_windows = max(1, -(-T // W))
        dens = max(int(arrs.det_mask[w * W:(w + 1) * W].sum())
                   for w in range(n_windows))
        capacity = min(max(256, -(-(dens + chunk) // 256) * 256), W * N)
        f = window_fn(W, capacity)

        state = module.init_state(N)
        ids = np.full((n_windows * W, N), -1, np.int32)
        det_score = np.zeros((n_windows * W, N), np.float32)
        t0 = time.perf_counter()
        for w in range(n_windows):
            sl = slice(w * W, (w + 1) * W)
            im = np.zeros((W,) + arrs.images.shape[1:], arrs.images.dtype)
            cl = np.zeros((W,) + arrs.clouds.shape[1:], np.float32)
            cv = np.zeros((W,) + arrs.cloud_valid.shape[1:], bool)
            bx = np.zeros((W, N, 4), np.float32)
            b3 = np.zeros((W, N, 7), np.float32)
            dm = np.zeros((W, N), bool)
            n = arrs.images[sl].shape[0]
            im[:n] = arrs.images[sl]
            cl[:n] = arrs.clouds[sl]
            cv[:n] = arrs.cloud_valid[sl]
            bx[:n] = arrs.boxes[sl]
            if use_box3d:
                b3[:n] = arrs.boxes3d[sl]
            dm[:n] = arrs.det_mask[sl]
            out, state = f(jnp.asarray(im), jnp.asarray(cl),
                           jnp.asarray(cv), jnp.asarray(bx),
                           jnp.asarray(b3), jnp.asarray(arrs.velo_to_rect),
                           jnp.asarray(dm), jnp.asarray(arrs.proj), state)
            out = jax.block_until_ready(out)
            ids[w * W:w * W + n] = np.asarray(out["ids"])[:n]
            det_score[w * W:w * W + n] = np.asarray(out["det_score"])[:n]
            n_dropped += int(out["n_dropped"])
        dt = time.perf_counter() - t0
        if i > 0:
            total_frames += T
            t_total += dt
        keep = arrs.det_mask
        if score_threshold > 0:
            keep = keep & (det_score[:T] >= score_threshold)
        objs = []
        for t in range(T):
            for n in range(N):
                if not keep[t, n] or ids[t, n] < 0:
                    continue
                objs.append(KittiObject(
                    frame=int(arrs.frame_ids[t]), track_id=int(ids[t, n]),
                    obj_type="Car", bbox=arrs.boxes[t, n],
                    score=float(arrs.scores[t, n])))
        path = os.path.join(res_dir, f"{seq}.txt")
        write_kitti_result(objs, path)
        if log:
            log.info("sequence %s: %d frames in %.2fs -> %s (%d programs)",
                     seq, T, dt, path, len(fns))
        if evaluate:
            gt_path = os.path.join(data_cfg.root, "label_02", f"{seq}.txt")
            if os.path.exists(gt_path):
                gt = read_kitti_tracking_labels(gt_path)
                trk = read_kitti_tracking_labels(path)
                ev.add_sequence(gt, trk)
                one = TrackingEvaluation(cls="car")
                one.add_sequence(gt, trk)
                per_seq[seq] = one.compute()

    stats = {"n_programs": len(fns), "n_dropped": n_dropped,
             "total_frames": total_frames,
             "fps": total_frames / max(t_total, 1e-9)}
    if n_dropped and log:
        log.warning("%d detections dropped by compaction capacity — "
                    "results are incomplete", n_dropped)
    if evaluate:
        m = ev.compute()
        stats["metrics"] = m
        stats["per_sequence"] = per_seq
        with open(os.path.join(res_dir, "summary_car.txt"), "w") as fh:
            fh.write(m.summary_text())
        if log:
            log.info("metrics: %s", m.summary())
    return stats
