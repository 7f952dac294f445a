"""Training CLI — rebuild of the reference entry point (reference: main.py:
``python main.py --config experiments/<exp>/config.yaml [--load-path ...
--recover] [-e]``).

Data source: real KITTI tracking (``config.data.root``) when present on
disk, otherwise the synthetic generator (``--synthetic``) so the full loop
runs anywhere.  Validation runs online tracking + the devkit scorer each
``--val-every`` epochs and keeps the best-MOTA checkpoint, like the
reference's validate()/save_checkpoint(best) flow.
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="mmmot_tpu training")
    p.add_argument("--config", required=True)
    p.add_argument("--load-path", default=None,
                   help="checkpoint dir to load weights from")
    p.add_argument("--pretrained-vgg", default=None,
                   help="torchvision vgg<depth>_bn .pth to initialise the "
                        "appearance backbone (reference: "
                        "vgg16_bn(pretrained=True))")
    p.add_argument("--recover", action="store_true",
                   help="resume training (optimizer state + step)")
    p.add_argument("-e", "--evaluate", action="store_true",
                   help="validate only, no training")
    p.add_argument("--result-path", default="results")
    p.add_argument("--synthetic", action="store_true",
                   help="force synthetic data even if config.data.root exists")
    p.add_argument("--steps-per-epoch", type=int, default=50)
    p.add_argument("--val-every", type=int, default=5)
    p.add_argument("--val-sequences", type=int, default=2)
    p.add_argument("--val-frames", type=int, default=20)
    p.add_argument("--val-seqs", default=None,
                   help="comma-separated held-out KITTI sequences for "
                        "validation (real-data mode); default: last 25%%")
    p.add_argument("--val-batch-sequences", type=int, default=1,
                   help="vmap this many val sequences per window call")
    p.add_argument("--val-window", type=int, default=64,
                   help="streaming window for real-data validation")
    p.add_argument("--log-dir", default=None,
                   help="scalar log dir (default: runs/<config name>)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
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
    from mmmot_tpu.data.synthetic import (make_synthetic_sequence,
                                          make_training_batch)
    from mmmot_tpu.eval import TrackingEvaluation
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule, track_sequence
    from mmmot_tpu.train import create_train_state, train_step
    from mmmot_tpu.train.checkpoint import (latest_step, restore_checkpoint,
                                            save_checkpoint)

    from mmmot_tpu.utils.meters import create_logger

    log = create_logger("mmmot.train")

    cfg = load_config(args.config)
    net = model_entry(cfg.model)
    rng = np.random.default_rng(cfg.train.seed)
    key = jax.random.PRNGKey(cfg.train.seed)

    N = cfg.data.max_dets
    P = cfg.data.point_len
    crop = cfg.data.crop_size

    use_synthetic = args.synthetic or not os.path.isdir(cfg.data.root)
    val_seqs = None
    if use_synthetic:
        def next_batch():
            b = make_training_batch(rng, batch_size=cfg.train.batch_size,
                                    num_slots=N, crop_size=crop,
                                    points_per_det=P, drop_prob=0.1,
                                    fp_prob=0.2)
            return {k: jnp.asarray(v) for k, v in b.items()}
    else:
        from mmmot_tpu.data.kitti_loader import KittiPairLoader

        all_seqs = KittiPairLoader(cfg.data, seed=cfg.train.seed
                                   ).ds.sequences
        if args.val_seqs:
            val_seqs = [s for s in args.val_seqs.split(",") if s]
        else:
            # Held-out validation: last quarter of sequences (>= 1),
            # mirroring the reference's train/val split of the KITTI
            # training sequences (main.py validate(); SURVEY.md §2.1).
            n_val = max(1, len(all_seqs) // 4)
            val_seqs = all_seqs[-n_val:] if len(all_seqs) > 1 else \
                all_seqs
        train_seqs = [s for s in all_seqs if s not in val_seqs] or all_seqs
        loader = KittiPairLoader(cfg.data, seed=cfg.train.seed,
                                 sequences=tuple(train_seqs))
        log.info("real KITTI training: %d train seqs, val on %s (%s)",
                 len(train_seqs), val_seqs, cfg.data.root)
        batch_iter = loader.batches(cfg.train.batch_size)

        def next_batch():
            return next(batch_iter)

    batch0 = next_batch()
    state = create_train_state(net, cfg.train, key, batch0,
                               steps_per_epoch=args.steps_per_epoch)
    if args.pretrained_vgg:
        from mmmot_tpu.compat.pretrained import load_pretrained_vgg

        variables, report = load_pretrained_vgg(
            {"params": state.params, "batch_stats": state.batch_stats},
            args.pretrained_vgg, depth=cfg.model.appearance.depth)
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        log.info("pretrained VGG loaded: %d tensors from %s",
                 len(report["converted"]), args.pretrained_vgg)
    ckpt_dir = os.path.join(cfg.train.ckpt_dir, cfg.name)
    start_epoch = 0
    if args.recover and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        start_epoch = int(state.step) // args.steps_per_epoch
        log.info("recovered from %s at step %d", ckpt_dir, int(state.step))
    elif args.load_path:
        state = restore_checkpoint(args.load_path, state)
        log.info("loaded weights from %s", args.load_path)

    from mmmot_tpu.data.augment import augment_batch

    def _step(s, b, r):
        if cfg.data.augmentation:
            ra, rd = jax.random.split(r)
            b = augment_batch(ra, b)
        else:
            rd = r
        return train_step(net, s, b, rd,
                          loss_weights=cfg.train.loss_weights,
                          compact_capacity=cfg.train.compact_capacity)

    step_fn = jax.jit(_step)

    def validate(state, tag):
        module = TrackingModule(
            net, {"params": state.params, "batch_stats": state.batch_stats},
            cfg.assoc)
        res_dir = os.path.join(args.result_path, cfg.name, tag)
        if val_seqs is not None:
            # Real-data validation: devkit-scored tracking on held-out
            # KITTI sequences — best-checkpoint selection sees real MOTA
            # (reference: main.py validate()).
            from mmmot_tpu.tracker.kitti_runner import track_kitti_sequences

            stats = track_kitti_sequences(
                module, cfg.data, res_dir, sequences=val_seqs,
                window=args.val_window, evaluate=True,
                batch_sequences=args.val_batch_sequences,
                max_frames=args.val_frames if args.val_frames > 0 else
                None, log=log)
            m = stats["metrics"]
            log.info("[val %s] %s", tag, m.summary())
            return m
        track = jax.jit(lambda c, p, pm, dm: track_sequence(
            module, c, p, pm, dm))
        ev = TrackingEvaluation(cls="car")
        for s in range(args.val_sequences):
            world = make_synthetic_sequence(
                np.random.default_rng(1000 + s),
                num_frames=args.val_frames, num_slots=N, crop_size=crop,
                points_per_det=P, drop_prob=0.05, fp_prob=0.1)
            out = track(jnp.asarray(world.crops), jnp.asarray(world.points),
                        jnp.asarray(world.point_mask),
                        jnp.asarray(world.det_mask))
            ids = np.asarray(out["ids"])
            res = tracker_output_to_objects(ids, world.det_mask,
                                            world.boxes2d, world.scores)
            write_kitti_result(res, os.path.join(res_dir, f"{s:04d}.txt"))
            gt = tracker_output_to_objects(
                world.gt_ids, world.det_mask & (world.gt_ids >= 0),
                world.boxes2d)
            gt_by_frame = {}
            for o in gt:
                gt_by_frame.setdefault(o.frame, []).append(o)
            res_by_frame = {}
            for o in res:
                res_by_frame.setdefault(o.frame, []).append(o)
            ev.add_sequence(gt_by_frame, res_by_frame,
                            num_frames=args.val_frames)
        m = ev.compute()
        log.info("[val %s] %s", tag, m.summary())
        return m

    if args.evaluate:
        validate(state, "eval")
        return

    # Structured scalar logging (reference: tensorboardX in main.py).
    from mmmot_tpu.train.trainer import build_schedule
    from mmmot_tpu.utils.scalars import ScalarWriter

    log_dir = args.log_dir or os.path.join("runs", cfg.name)
    writer = ScalarWriter(log_dir)
    lr_of = build_schedule(cfg.train, args.steps_per_epoch)
    log.info("scalars -> %s (JSONL + tensorboard)", log_dir)

    best_mota = -1e9
    for epoch in range(start_epoch, cfg.train.epochs):
        t0 = time.time()
        losses = []
        for i in range(args.steps_per_epoch):
            batch = next_batch()
            state, metrics = step_fn(
                state, batch, jax.random.fold_in(key, int(state.step)))
            losses.append(float(metrics["total"]))
            if (i + 1) % cfg.train.log_every == 0:
                log.info("epoch %d step %d/%d loss %.4f", epoch, i + 1,
                         args.steps_per_epoch, losses[-1])
                step = int(state.step)
                writer.write(step, lr=float(lr_of(step)),
                             **{f"loss/{k}": float(v)
                                for k, v in metrics.items()})
        log.info("epoch %d done in %.1fs mean loss %.4f", epoch,
                 time.time() - t0, sum(losses) / len(losses))
        writer.write(int(state.step),
                     **{"epoch": epoch,
                        "loss/epoch_mean": sum(losses) / len(losses)})
        save_checkpoint(ckpt_dir, state, int(state.step),
                        keep=cfg.train.ckpt_keep)
        if (epoch + 1) % args.val_every == 0 or epoch == cfg.train.epochs - 1:
            m = validate(state, f"epoch{epoch}")
            writer.write(int(state.step), **{
                "val/mota": m.mota, "val/motp": m.motp,
                "val/ids": m.id_switches, "val/recall": m.recall,
                "val/precision": m.precision})
            if m.mota > best_mota:
                best_mota = m.mota
                save_checkpoint(ckpt_dir + "_best", state, int(state.step),
                                keep=1, metrics={"mota": m.mota})
                log.info("new best MOTA %.4f", m.mota)
    writer.close()


if __name__ == "__main__":
    main()
