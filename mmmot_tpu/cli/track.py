"""Sequence tracking / evaluation CLI — rebuild of the reference
``eval_seq.py`` (load config + checkpoint, run the tracker over sequences,
write KITTI result txts, score with the devkit).

Without a real KITTI tree it tracks synthetic sequences, which exercises the
identical code path end-to-end (model -> scan tracker -> txt -> metrics).
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="mmmot_tpu sequence tracking")
    p.add_argument("--config", required=True)
    p.add_argument("--load-path", default=None, help="checkpoint dir")
    p.add_argument("--result-path", default="results")
    p.add_argument("--result-sha", default="latest",
                   help="result subdirectory tag (reference: result_sha)")
    p.add_argument("--sequences", type=int, default=3)
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--no-eval", action="store_true",
                   help="skip devkit scoring")
    p.add_argument("--score-threshold", type=float, default=0.0,
                   help="drop output detections whose learned confidence "
                        "(det head) is below this")
    p.add_argument("--solver", default=None,
                   help="override association solver "
                        "(auction|sinkhorn|greedy|ilp|lap|native)")
    p.add_argument("--window", type=int, default=64,
                   help="streaming window (frames per compiled step); "
                        "sequences of any length share one program")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        from mmmot_tpu.utils.jax_setup import force_cpu

        force_cpu()
    from mmmot_tpu.utils.jax_setup import setup_jax

    setup_jax()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmmot_tpu.config import load_config
    from mmmot_tpu.data.kitti_io import (tracker_output_to_objects,
                                         write_kitti_result)
    from mmmot_tpu.data.synthetic import make_synthetic_sequence
    from mmmot_tpu.eval import TrackingEvaluation
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence
    from mmmot_tpu.train import create_train_state
    from mmmot_tpu.train.checkpoint import restore_checkpoint

    from mmmot_tpu.utils.meters import create_logger

    log = create_logger("mmmot.track")

    cfg = load_config(args.config)
    if args.solver:
        import dataclasses

        cfg = cfg.replace(assoc=dataclasses.replace(cfg.assoc,
                                                    solver=args.solver))
    net = model_entry(cfg.model)
    N, P, crop = cfg.data.max_dets, cfg.data.point_len, cfg.data.crop_size

    key = jax.random.PRNGKey(0)
    dummy = {
        "crops": jnp.zeros((1, 2, N) + tuple(crop) + (3,)),
        "points": jnp.zeros((1, 2, N, P, 4)),
        "point_mask": jnp.ones((1, 2, N, P), bool),
        "det_mask": jnp.ones((1, 2, N), bool),
    }
    state = create_train_state(net, cfg.train, key, dummy)
    if args.load_path:
        state = restore_checkpoint(args.load_path, state)
        log.info("loaded checkpoint from %s", args.load_path)

    module = TrackingModule(
        net, {"params": state.params, "batch_stats": state.batch_stats},
        cfg.assoc)
    track = jax.jit(
        lambda c, p, pm, dm: track_sequence(module, c, p, pm, dm))

    res_dir = os.path.join(args.result_path, cfg.name, args.result_sha)
    ev = TrackingEvaluation(cls="car")

    if os.path.isdir(cfg.data.root):
        return _track_kitti(args, cfg, module, res_dir, ev, log)

    total_frames = 0
    t_total = 0.0
    for s in range(args.sequences):
        world = make_synthetic_sequence(
            np.random.default_rng(2000 + s), num_frames=args.frames,
            num_slots=N, crop_size=crop, points_per_det=P,
            drop_prob=0.05, fp_prob=0.1)
        t0 = time.perf_counter()
        out = jax.block_until_ready(track(
            jnp.asarray(world.crops), jnp.asarray(world.points),
            jnp.asarray(world.point_mask), jnp.asarray(world.det_mask)))
        dt = time.perf_counter() - t0
        if s > 0:  # skip compile run in FPS accounting
            t_total += dt
            total_frames += args.frames
        ids = np.asarray(out["ids"])
        det_mask = world.det_mask
        if args.score_threshold > 0:
            det_mask = det_mask & (np.asarray(out["det_score"])
                                   >= args.score_threshold)
        res = tracker_output_to_objects(ids, det_mask, world.boxes2d,
                                        world.scores)
        path = os.path.join(res_dir, f"{s:04d}.txt")
        write_kitti_result(res, path)
        log.info("sequence %04d: %d frames in %.3fs -> %s", s, args.frames,
                 dt, path)
        if not args.no_eval:
            gt = tracker_output_to_objects(
                world.gt_ids, world.det_mask & (world.gt_ids >= 0),
                world.boxes2d)
            gtf, resf = {}, {}
            for o in gt:
                gtf.setdefault(o.frame, []).append(o)
            for o in res:
                resf.setdefault(o.frame, []).append(o)
            ev.add_sequence(gtf, resf, num_frames=args.frames)
    if total_frames:
        log.info("throughput: %.1f FPS (steady-state)",
                 total_frames / max(t_total, 1e-9))
    if not args.no_eval:
        log.info("metrics: %s", ev.compute().summary())


def _track_kitti(args, cfg, module, res_dir, ev, log):
    """Real-data path: stream KITTI sequences end-to-end (eval_seq.py).

    Sequences of any length run through ONE compiled program: fixed-size
    windows of ``args.window`` frames with the TrackerState carried across
    windows (IDs continue seamlessly).  The last window of a sequence is
    padded with all-invalid frames.  Capacity for valid-slot compaction is
    quantized to multiples of 256 so a denser dataset costs at most a
    couple of extra compiles, not one per sequence.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmmot_tpu.data.kitti_io import (KittiObject,
                                         read_kitti_tracking_labels,
                                         write_kitti_result)
    from mmmot_tpu.data.kitti_loader import load_eval_sequences
    from mmmot_tpu.tracker import track_sequence_from_frames

    crop = tuple(cfg.data.crop_size)
    P = cfg.data.point_len
    W = args.window
    chunk = 64

    fns = {}            # capacity -> jitted window fn (compile cache)

    def window_fn(capacity):
        if capacity not in fns:
            fns[capacity] = jax.jit(
                lambda im, cl, cv, bx, dm, pr, st:
                track_sequence_from_frames(
                    module, im, cl, bx, dm, pr, crop, P, cloud_valid=cv,
                    compact_capacity=capacity, extract_chunk=chunk,
                    state0=st, return_state=True))
        return fns[capacity]

    total_frames, t_total, n_dropped = 0, 0.0, 0
    for i, (seq, arrs) in enumerate(load_eval_sequences(cfg.data)):
        T, N = arrs.det_mask.shape
        n_windows = max(1, -(-T // W))
        # Capacity: densest window of this sequence, rounded up to 256.
        dens = max(int(arrs.det_mask[w * W:(w + 1) * W].sum())
                   for w in range(n_windows))
        capacity = max(256, -(-(dens + chunk) // 256) * 256)
        f = window_fn(capacity)

        state = None
        ids = np.full((n_windows * W, N), -1, np.int32)
        det_score = np.zeros((n_windows * W, N), np.float32)
        t0 = time.perf_counter()
        for w in range(n_windows):
            sl = slice(w * W, (w + 1) * W)
            im = np.zeros((W,) + arrs.images.shape[1:], arrs.images.dtype)
            cl = np.zeros((W,) + arrs.clouds.shape[1:], np.float32)
            cv = np.zeros((W,) + arrs.cloud_valid.shape[1:], bool)
            bx = np.zeros((W, N, 4), np.float32)
            dm = np.zeros((W, N), bool)
            n = arrs.images[sl].shape[0]
            im[:n] = arrs.images[sl]
            cl[:n] = arrs.clouds[sl]
            cv[:n] = arrs.cloud_valid[sl]
            bx[:n] = arrs.boxes[sl]
            dm[:n] = arrs.det_mask[sl]
            if state is None:
                state = module.init_state(N)
            out, state = f(jnp.asarray(im), jnp.asarray(cl),
                           jnp.asarray(cv), jnp.asarray(bx),
                           jnp.asarray(dm), jnp.asarray(arrs.proj), state)
            out = jax.block_until_ready(out)
            ids[sl] = np.asarray(out["ids"])[:n]
            det_score[sl] = np.asarray(out["det_score"])[:n]
            n_dropped += int(out["n_dropped"])
        dt = time.perf_counter() - t0
        if i > 0:
            total_frames += T
            t_total += dt
        keep = arrs.det_mask
        if args.score_threshold > 0:
            keep = keep & (det_score[:T] >= args.score_threshold)
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
        log.info("sequence %s: %d frames in %.2fs -> %s (%d programs)",
                 seq, T, dt, path, len(fns))
        if not args.no_eval:
            gt_path = os.path.join(cfg.data.root, "label_02", f"{seq}.txt")
            if os.path.exists(gt_path):
                ev.add_sequence(read_kitti_tracking_labels(gt_path),
                                read_kitti_tracking_labels(path))
    if n_dropped:
        log.warning("%d detections dropped by compaction capacity — "
                    "results are incomplete; raise --window density cap",
                    n_dropped)
    if total_frames:
        log.info("throughput: %.1f FPS (steady-state), %d compiled "
                 "programs", total_frames / max(t_total, 1e-9), len(fns))
    stats = {"n_programs": len(fns), "n_dropped": n_dropped,
             "total_frames": total_frames}
    if not args.no_eval:
        m = ev.compute()
        log.info("metrics: %s", m.summary())
        with open(os.path.join(res_dir, "summary_car.txt"), "w") as fh:
            fh.write(m.summary_text())
        stats["metrics"] = m
    return stats


if __name__ == "__main__":
    main()
