"""Reusable windowed KITTI tracking runner (shared by the eval CLI and the
training loop's real-data validation).

Sequences of any length run through ONE compiled program: fixed-size
windows of ``window`` frames with the TrackerState carried across windows
(IDs continue seamlessly).  The last window of a sequence is padded with
all-invalid frames.  Valid-slot compaction capacity is quantized to
multiples of 256 so a denser dataset costs at most a couple of extra
compiles, never one per sequence (reference eval_seq.py pays a Python
loop + per-frame host ILP instead; SURVEY.md §3.2).

``batch_sequences`` > 1 additionally runs the windows of several sequences
through one *vmapped* program (each sequence's TrackerState carried
independently) — the single-chip throughput regime of bench.py (S=8:
442 FPS vs S=1: 330 FPS at the faithful scale).  Results are identical to
the serial path (per-sequence scans are independent); host memory grows by
the group's sequence arrays.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence

import numpy as np

from mmmot_tpu.config import DataConfig
from mmmot_tpu.tracker.tracker import TrackingModule

# Compiled window programs, shared across track_kitti_sequences calls
# (training-loop validation re-enters every epoch with fresh variables).
_WINDOW_FNS: dict = {}


def _crop_window(boxes: np.ndarray, det_mask: np.ndarray,
                 frame_width: int) -> int:
    """Crop band width for a sequence: >= the widest valid box (a narrower
    band silently crops edge-replicated content), rounded to 128 so a
    handful of buckets cover a dataset, capped at the frame width.  The
    floor is 256: band slicing cost is linear in the window, and typical
    KITTI car boxes are well under 256 px wide."""
    widths = (boxes[..., 2] - boxes[..., 0])[det_mask]
    wmax = float(widths.max()) if widths.size else 0.0
    return int(min(max(256, -(-wmax // 128) * 128), frame_width))


def _seq_plan(arrs, window: int) -> Dict:
    """Per-sequence program parameters (capacity/crop-window buckets)."""
    T, N = arrs.det_mask.shape
    n_windows = max(1, -(-T // window))
    # Exact capacity: dens is the true max valid-slot count over this
    # sequence's windows, so no headroom is needed (extraction cost is
    # linear in capacity; a chunk of slack measured -7% FPS in bench).
    dens = max(int(arrs.det_mask[w * window:(w + 1) * window].sum())
               for w in range(n_windows))
    capacity = min(max(256, -(-dens // 256) * 256), window * N)
    crop_window = _crop_window(arrs.boxes, arrs.det_mask,
                               arrs.images.shape[2])
    return {"n_windows": n_windows, "capacity": capacity,
            "crop_window": crop_window}


def track_kitti_sequences(module: TrackingModule, data_cfg: DataConfig,
                          res_dir: str,
                          sequences: Optional[Sequence[str]] = None,
                          window: int = 64, chunk: int = 256,
                          score_threshold: float = 0.0,
                          score_sweep: Optional[Sequence[float]] = None,
                          evaluate: bool = True,
                          max_frames: Optional[int] = None,
                          batch_sequences: int = 1,
                          dead_sensor: Optional[str] = None,
                          log=None) -> Dict:
    """Track KITTI sequences, write result txts, optionally devkit-score.

    Returns a stats dict: n_programs, n_dropped, total_frames, fps, and
    (when ``evaluate``) ``metrics`` (TrackingMetrics) + ``per_sequence``.

    ``score_sweep`` evaluates extra det-head score thresholds from the SAME
    tracked output (the threshold is purely an output filter on the model's
    det scores, so one tracking pass serves every sweep point): each value
    writes result txts under ``res_dir/thr_<t>/`` and lands its metrics in
    ``stats["sweep"][t]``.
    """
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.data.kitti_dataset import KittiTrackingDataset
    from mmmot_tpu.data.kitti_io import (read_kitti_tracking_labels,
                                         tracker_output_to_objects,
                                         write_kitti_result)
    from mmmot_tpu.eval import HotaEvaluation, TrackingEvaluation

    crop = tuple(data_cfg.crop_size)
    P = data_cfg.point_len
    joint = data_cfg.track_class == "All"
    if joint and not module.class_gating:
        raise ValueError(
            "track_class 'All' (joint multi-class) requires "
            "assoc.class_gate: true — without it the LP would link "
            "detections across classes")
    ds = KittiTrackingDataset(data_cfg, max_cloud_points=32768)
    seqs = list(sequences) if sequences is not None else ds.sequences
    unknown = [s for s in seqs if s not in set(ds.sequences)]
    if unknown:
        # A numeric --sequences value here is usually the synthetic-mode
        # COUNT applied to real data by mistake (ADVICE r2).
        hint = (" (--sequences takes sequence NAMES for real KITTI data; "
                "a COUNT applies only to synthetic data)"
                if any(u.isdigit() for u in unknown) else "")
        raise SystemExit(
            f"unknown sequence name(s) {unknown}; available: "
            f"{ds.sequences}{hint}")

    from mmmot_tpu.tracker.sequence import track_sequence_from_frames

    use_box3d = data_cfg.point_source == "box3d"
    local_keys = set()

    def window_fn(S_b, W, capacity, crop_window):
        # Cached across calls (training-loop validation runs this every
        # epoch; the window program must not recompile when only the
        # variables change, so variables are an ARGUMENT, not a closure).
        # Keyed on the model CONFIG, not id(net): CPython reuses ids after
        # GC, so a fresh net allocated at a dead net's address would hit a
        # stale program compiled for a different architecture; equal-config
        # nets are interchangeable templates (variables are an argument).
        key = (module.net.cfg, module.assoc_cfg, crop, P, chunk,
               data_cfg.point_source, module.use_pallas_affinity,
               module.pallas_interpret, module.parallel_assoc,
               module.hybrid_presolve, S_b, W,
               capacity, crop_window, dead_sensor)
        local_keys.add(key)
        fresh = key not in _WINDOW_FNS
        if fresh:
            def run_one(variables, im, cl, cv, bx, b3, v2r, dm, dcl, pr,
                        st, _cap=capacity, _cw=crop_window):
                mod = TrackingModule(
                    module.net, variables, module.assoc_cfg,
                    use_pallas_affinity=module.use_pallas_affinity,
                    parallel_assoc=module.parallel_assoc,
                    pallas_interpret=module.pallas_interpret,
                    hybrid_presolve=module.hybrid_presolve)
                return track_sequence_from_frames(
                    mod, im, cl, bx, dm, pr, crop, P, cloud_valid=cv,
                    compact_capacity=_cap, extract_chunk=chunk, state0=st,
                    return_state=True, boxes3d=b3, velo_to_rect=v2r,
                    crop_window=_cw, point_source=data_cfg.point_source,
                    dead_sensor=dead_sensor, det_cls=dcl)

            if S_b == 1:
                _WINDOW_FNS[key] = jax.jit(run_one)
            else:
                # dcl is None for single-class runs: None args carry no
                # leaves, so vmap's axis spec over them is a no-op.
                _WINDOW_FNS[key] = jax.jit(jax.vmap(
                    run_one, in_axes=(None,) + (0,) * 10))
        return _WINDOW_FNS[key], fresh

    variables = module.variables
    n_dropped = 0

    def run_group(members: List[str], arrs_l):
        """Track a group of sequences through one (vmapped) program.

        Returns ([(seq, arrs, ids[T, N], det_score[T, N])], frames_counted,
        secs_counted); window 0 of a freshly-compiled program is excluded
        from the throughput accounting (it pays the compile).

        Window inputs are built and shipped to the device by a background
        thread two windows ahead: host->device transfer of the raw frames
        (~126 MB per 64-frame window at KITTI scale) would otherwise
        serialize with the ~0.2 s of device compute and dominate wall time.
        """
        nonlocal n_dropped
        plans = [_seq_plan(a, window) for a in arrs_l]
        S_b = len(members)
        W = window
        N = arrs_l[0].det_mask.shape[1]
        n_windows = max(p["n_windows"] for p in plans)
        capacity = max(p["capacity"] for p in plans)
        crop_window = max(p["crop_window"] for p in plans)
        f, fresh = window_fn(S_b, W, capacity, crop_window)

        # Sequences may carry different cloud paddings (cloud_filter
        # buckets M per sequence); a vmapped group ships the group max
        # and the clouds are padded to ONE run-level M on device (cheap
        # eager pad), so the expensive window program never recompiles
        # across buckets while transfers stay at the compact size.
        M_g = max(a.clouds.shape[1] for a in arrs_l)

        def member_window(a, w, field):
            # Zero-copy view for full windows (the zero-fill copies were
            # gigabytes per KITTI eval); only a trailing partial window
            # or a cloud-bucket mismatch pads into a fresh buffer.
            x = getattr(a, field)
            part = x[w * W:(w + 1) * W]
            if (field in ("clouds", "cloud_valid")
                    and x.shape[1] != M_g):
                buf = np.zeros((W, M_g) + x.shape[2:], x.dtype)
                buf[:part.shape[0], :x.shape[1]] = part
                return buf
            if part.shape[0] == W:
                return part
            buf = np.zeros((W,) + x.shape[1:], x.dtype)
            buf[:part.shape[0]] = part
            return buf

        def stacked(field, w):
            if S_b == 1:
                return member_window(arrs_l[0], w, field)
            return np.stack([member_window(a, w, field) for a in arrs_l])

        states = [module.init_state(N, dead_sensor=dead_sensor)
                  for _ in members]
        state = (states[0] if S_b == 1 else
                 jax.tree.map(lambda *xs: jnp.stack(xs), *states))
        ids = [np.full((n_windows * W, N), -1, np.int32) for _ in members]
        det_score = [np.zeros((n_windows * W, N), np.float32)
                     for _ in members]
        coverage = module.ghost_coverage
        G = N  # ghost-pool size (state slots = 2N)
        g_ids = [np.full((n_windows * W, G), -1, np.int32)
                 for _ in members] if coverage else None
        g_boxes = [np.zeros((n_windows * W, G, 4), np.float32)
                   for _ in members] if coverage else None
        g_scores = [np.zeros((n_windows * W, G), np.float32)
                    for _ in members] if coverage else None

        def squeeze(x):
            return x[0] if S_b == 1 else x

        v2r = jnp.asarray(squeeze(np.stack([a.velo_to_rect
                                            for a in arrs_l])))
        proj = jnp.asarray(squeeze(np.stack([a.proj for a in arrs_l])))
        # 2D-only detections: the window program still takes a boxes3d
        # operand; one all-zero buffer reused for every window.
        b3_zeros = (None if use_box3d else jnp.zeros(
            ((W, N, 7) if S_b == 1 else (S_b, W, N, 7)), jnp.float32))

        M_run = ds.max_cloud_points

        def ship(w):
            """Device puts for one window (JAX transfers are async — the
            bytes stream to the chip while earlier windows execute).
            Clouds transfer at the compact filtered size; the shipper
            thread only issues transfers — the on-device pad runs on the
            consumer thread (a cross-thread eager-compute chain wedged
            executions under the axon tunnel)."""
            return (jnp.asarray(stacked("images", w)),
                    jnp.asarray(stacked("clouds", w)),
                    jnp.asarray(stacked("cloud_valid", w)),
                    jnp.asarray(stacked("boxes", w)),
                    (jnp.asarray(stacked("boxes3d", w)) if use_box3d
                     else b3_zeros),
                    jnp.asarray(stacked("det_mask", w)),
                    (jnp.asarray(stacked("cls_ids", w)) if joint
                     else None))

        def pad_clouds(cl, cv):
            """Pad compact clouds to the fixed run-level M on device, so
            the window program keeps ONE shape across cloud buckets while
            transfers stay at the compact size (~0.1 ms HBM copy)."""
            if M_g == M_run:
                return cl, cv
            pad = M_run - M_g
            cl = jnp.pad(cl, [(0, 0)] * (cl.ndim - 2) + [(0, pad), (0, 0)])
            cv = jnp.pad(cv, [(0, 0)] * (cv.ndim - 1) + [(0, pad)])
            return cl, cv

        shipq: queue.Queue = queue.Queue(maxsize=2)
        stop = threading.Event()

        def put_checked(item):
            """Bounded put that gives up once the consumer has stopped, so
            no sentinel/buffers land on a dead queue (ADVICE r2)."""
            while not stop.is_set():
                try:
                    shipq.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def shipper():
            try:
                for w in range(n_windows):
                    if not put_checked((w, ship(w))):
                        return
                put_checked(None)
            except BaseException as e:  # surface in the consumer
                if not stop.is_set():
                    shipq.put(e)

        ship_thread = threading.Thread(target=shipper, daemon=True)
        ship_thread.start()

        frames_ctd, secs_ctd = 0, 0.0
        try:
            while True:
                # The queue wait is part of the timed window: when host
                # staging/transfer is the bottleneck the consumer idles
                # here, and excluding it would report device-only FPS.
                t0 = time.perf_counter()
                item = shipq.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                w, (im, cl, cv, bx, b3, dm, dcl) = item
                cl, cv = pad_clouds(cl, cv)
                out, state = f(variables, im, cl, cv, bx, b3, v2r, dm,
                               dcl, proj, state)
                # The host fetch is also timed: under the axon tunnel
                # block_until_ready can resolve before execution finishes,
                # so only the fetch gives an honest per-window time.
                o_ids = np.asarray(out["ids"]).reshape(S_b, W, N)
                o_ds = np.asarray(out["det_score"]).reshape(S_b, W, N)
                dt = time.perf_counter() - t0
                n_w = sum(min(W, max(0, a.det_mask.shape[0] - w * W))
                          for a in arrs_l)
                if not (fresh and w == 0):
                    frames_ctd += n_w
                    secs_ctd += dt
                if coverage:
                    o_gi = np.asarray(out["ghost_ids"]).reshape(S_b, W, G)
                    o_gb = np.asarray(out["ghost_boxes"]).reshape(
                        S_b, W, G, 4)
                    o_gs = np.asarray(out["ghost_scores"]).reshape(
                        S_b, W, G)
                for j, a in enumerate(arrs_l):
                    T = a.det_mask.shape[0]
                    n = min(W, max(0, T - w * W))
                    ids[j][w * W:w * W + n] = o_ids[j][:n]
                    det_score[j][w * W:w * W + n] = o_ds[j][:n]
                    if coverage:
                        g_ids[j][w * W:w * W + n] = o_gi[j][:n]
                        g_boxes[j][w * W:w * W + n] = o_gb[j][:n]
                        g_scores[j][w * W:w * W + n] = o_gs[j][:n]
                n_dropped += int(np.asarray(out["n_dropped"]).sum())
        finally:
            # Unblock a shipper stuck in put() so it exits and its staged
            # device buffers are dropped (an exception here would otherwise
            # leak ~3 windows of pinned buffers per failed eval).  Join the
            # thread BEFORE the final drain so no late put can strand
            # buffers on the dead queue (ADVICE r2).
            stop.set()
            while True:
                try:
                    shipq.get_nowait()
                except queue.Empty:
                    break
            ship_thread.join(timeout=30.0)
            while True:
                try:
                    shipq.get_nowait()
                except queue.Empty:
                    break
        if log:
            log.info("group %s: %d windows in %.2fs (%d programs)",
                     ",".join(members), n_windows, secs_ctd,
                     len(local_keys))
        ghosts = ([(gi, gb, gs) for gi, gb, gs
                   in zip(g_ids, g_boxes, g_scores)]
                  if coverage else [None] * len(members))
        return ([(s, a, i_, d_, gh) for s, a, i_, d_, gh
                 in zip(members, arrs_l, ids, det_score, ghosts)],
                frames_ctd, secs_ctd)

    cls = data_cfg.track_class.lower()
    # Joint multi-class: per-class devkit/HOTA accumulators scored from
    # the ONE tracking pass's result files (the devkit evaluates one class
    # at a time and ignores other-type rows, exactly like per-class runs).
    eval_classes = (("car", "pedestrian", "cyclist") if joint else (cls,))
    evs = {c: TrackingEvaluation(cls=c) for c in eval_classes}
    hevs = {c: HotaEvaluation(cls=c) for c in eval_classes}
    sweep = tuple(score_sweep or ())
    sweep_evs = {thr: {c: TrackingEvaluation(cls=c) for c in eval_classes}
                 for thr in sweep}
    per_seq = {}
    total_frames, t_total = 0, 0.0
    S_b = max(1, batch_sequences)
    groups = [seqs[i:i + S_b] for i in range(0, len(seqs), S_b)]

    def load_group(members):
        return [ds.load_sequence(s, max_frames=max_frames)
                for s in members]

    # Pipeline host loading (PNG decode + cloud read) one group ahead of
    # device execution: on a single-core host the decode alone is ~15 ms
    # per frame and would otherwise serialize with tracking.
    loader = ThreadPoolExecutor(max_workers=1)
    try:
        fut = loader.submit(load_group, groups[0]) if groups else None
        for gi, members in enumerate(groups):
            arrs_l = fut.result()
            fut = (loader.submit(load_group, groups[gi + 1])
                   if gi + 1 < len(groups) else None)
            results, frames_ctd, secs_ctd = run_group(members, arrs_l)
            total_frames += frames_ctd
            t_total += secs_ctd
            for seq, arrs, ids, det_score, ghosts in results:
                T = arrs.det_mask.shape[0]
                keep = arrs.det_mask
                if score_threshold > 0:
                    keep = keep & (det_score[:T] >= score_threshold)
                # Detections' 3D boxes propagate into the result rows
                # (reference results carry the detector's 3D fields and
                # the KITTI 3D tracking eval reads them; SURVEY §2.14
                # write_kitti_result); per-det validity is the dataset's
                # has_3d mask so 2D-only dets keep the -10 sentinel.
                type_kw = (dict(obj_types=arrs.cls_ids[:T],
                                type_names=list(
                                    KittiTrackingDataset.CLASS_GROUPS))
                           if joint else {})
                objs = tracker_output_to_objects(
                    ids[:T], keep, arrs.boxes, scores=arrs.scores,
                    boxes3d=arrs.boxes3d, obj_type=data_cfg.track_class,
                    frame_ids=arrs.frame_ids, has_3d=arrs.has_3d,
                    **type_kw)
                ghost_objs = []
                g_sc = None
                if ghosts is not None:
                    # Ghost-coverage rows (assoc.ghost_coverage): a track
                    # missing <= coverage_max_miss (<= revival_window)
                    # frames keeps emitting its extrapolated box under its
                    # own id, so dropout bursts stop fragmenting the
                    # trajectory.  Each row is scored by the track's LAST
                    # det-head confidence so downstream consumers can
                    # threshold coverage like real detections.
                    gi, gb, g_sc = ghosts
                    ghost_objs = tracker_output_to_objects(
                        gi[:T], gi[:T] >= 0, gb[:T], scores=g_sc[:T],
                        obj_type=data_cfg.track_class,
                        frame_ids=arrs.frame_ids)
                    if joint:
                        # A ghost row inherits its track's class (the
                        # track id is class-pure under the class gate).
                        id2type = {o.track_id: o.obj_type for o in objs}
                        for g in ghost_objs:
                            g.obj_type = id2type.get(g.track_id,
                                                     g.obj_type)
                    objs = objs + ghost_objs
                path = os.path.join(res_dir, f"{seq}.txt")
                write_kitti_result(objs, path)
                if log:
                    log.info("sequence %s: %d frames -> %s", seq, T, path)
                gt_path = os.path.join(data_cfg.root, "label_02",
                                       f"{seq}.txt")
                gt = (read_kitti_tracking_labels(gt_path)
                      if evaluate and os.path.exists(gt_path) else None)
                nf_sweep = (int(arrs.frame_ids[-1]) + 1
                            if len(arrs.frame_ids) else T)
                for thr in sweep:
                    tdir = os.path.join(res_dir, f"thr_{thr:g}")
                    os.makedirs(tdir, exist_ok=True)
                    tpath = os.path.join(tdir, f"{seq}.txt")
                    write_kitti_result(tracker_output_to_objects(
                        ids[:T], keep & (det_score[:T] >= thr), arrs.boxes,
                        scores=arrs.scores, boxes3d=arrs.boxes3d,
                        obj_type=data_cfg.track_class,
                        frame_ids=arrs.frame_ids, has_3d=arrs.has_3d)
                        # Ghost rows sweep on their carried det-head
                        # confidence, exactly like real detections.
                        + [g for g in ghost_objs if g.score >= thr],
                        tpath)
                    if gt is not None:
                        tt = read_kitti_tracking_labels(tpath)
                        for c in eval_classes:
                            sweep_evs[thr][c].add_sequence(
                                gt, tt, num_frames=nf_sweep)
                if gt is not None:
                    trk = read_kitti_tracking_labels(path)
                    # Score exactly the tracked range: with max_frames the
                    # GT beyond the last tracked frame would otherwise
                    # count as pure FN and corrupt validation MOTA.  The
                    # bound comes from the true KITTI frame numbers, not
                    # the loaded count — a tree with frame-file gaps has
                    # frame_ids[-1] + 1 > T and result rows beyond T
                    # would silently drop from scoring (ADVICE r2).
                    for c in eval_classes:
                        evs[c].add_sequence(gt, trk, num_frames=nf_sweep)
                        hevs[c].add_sequence(gt, trk, num_frames=nf_sweep)
                    one = TrackingEvaluation(cls=eval_classes[0])
                    one.add_sequence(gt, trk, num_frames=nf_sweep)
                    per_seq[seq] = one.compute()

    finally:
        loader.shutdown(wait=False, cancel_futures=True)

    stats = {"n_programs": len(local_keys), "n_dropped": n_dropped,
             "total_frames": total_frames,
             "fps": total_frames / max(t_total, 1e-9)}
    if n_dropped and log:
        log.warning("%d detections dropped by compaction capacity — "
                    "results are incomplete", n_dropped)
    if evaluate:
        by_cls = {c: evs[c].compute() for c in eval_classes}
        hota_by_cls = {c: hevs[c].compute() for c in eval_classes}
        stats["per_sequence"] = per_seq
        if joint:
            stats["metrics_by_class"] = by_cls
            stats["hota_by_class"] = hota_by_cls
            if sweep:
                stats["sweep"] = {
                    thr: {c: e.compute() for c, e in d.items()}
                    for thr, d in sweep_evs.items()}
        else:
            stats["metrics"] = by_cls[cls]
            stats["hota"] = hota_by_cls[cls]
            if sweep:
                stats["sweep"] = {thr: d[cls].compute()
                                  for thr, d in sweep_evs.items()}
        for c in eval_classes:
            with open(os.path.join(res_dir, f"summary_{c}.txt"),
                      "w") as fh:
                fh.write(by_cls[c].summary_text())
            with open(os.path.join(res_dir, f"hota_{c}.txt"), "w") as fh:
                fh.write(hota_by_cls[c].summary_text())
            if log:
                log.info("[%s] metrics: %s", c, by_cls[c].summary())
                log.info("[%s] hota: %s", c, hota_by_cls[c].summary())
    return stats
