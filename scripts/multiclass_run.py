"""Multi-class REAL-path demo: Car AND Pedestrian tracking at full scale.

The reference trains/evaluates per class (its devkit scores car and
pedestrian separately; the released models are car models).  This script
demonstrates the same per-class workflow end-to-end on the REAL streaming
pipeline at flagship scale: a fabricated multi-class tree
(scripts/make_bench_tree.py ``pedestrians>0``), one short training per
class (``data.track_class`` filters the dataset), devkit + HOTA scoring of
the held-out sequence per class.  Oracle detections — the point is the
multi-class capability, not detector noise (scripts/real_quality_run.py
owns that story for cars).

    python scripts/multiclass_run.py [--root /tmp/kitti_mc]
        [--epochs 6] [--steps-per-epoch 40]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--root", default="/tmp/kitti_mc")
    ap.add_argument("--seqs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--steps-per-epoch", type=int, default=40)
    ap.add_argument("--out", default="results/multiclass.json")
    ap.add_argument("--det-source", default="oracle",
                    help="oracle (GT boxes) or noisy (the simulated "
                         "detector, class-preserving); with noisy the "
                         "full mitigation stack is used (y_det LP "
                         "rejection + revival_window=2 + spatial gate, "
                         "as in scripts/real_quality_run.py)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        from mmmot_tpu.utils.jax_setup import force_cpu

        force_cpu()

    import jax
    import numpy as np

    from mmmot_tpu.configs import flagship, tiny
    from mmmot_tpu.data.augment import augment_batch
    from mmmot_tpu.data.kitti_loader import KittiPairLoader
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule
    from mmmot_tpu.tracker.kitti_runner import track_kitti_sequences
    from mmmot_tpu.train import create_train_state, train_step
    from mmmot_tpu.utils.jax_setup import setup_jax

    setup_jax()

    if not os.path.isdir(os.path.join(args.root, "image_02")):
        print(f"building multi-class tree at {args.root} "
              f"({args.seqs}x{args.frames}, 16 cars + 6 peds/seq) ...",
              flush=True)
        from scripts.make_bench_tree import build_tree

        build_tree(args.root, n_seqs=args.seqs, T=args.frames,
                   pedestrians=6)

    base = tiny(crop=64, max_dets=24, point_len=64) if args.tiny \
        else flagship()
    seq_names = [f"{i:04d}" for i in range(args.seqs)]
    train_seqs, val_seq = seq_names[:-1], seq_names[-1]

    noisy = args.det_source == "noisy"
    assoc = base.assoc
    if noisy:
        assoc = dataclasses.replace(
            assoc, use_det_scores=True, raw_new_end=True,
            revival_window=2, iou_weight=1.0, iou_gate=0.1)

    results = {}
    for cls in ("Car", "Pedestrian"):
        cfg = base.replace(
            assoc=assoc,
            data=dataclasses.replace(base.data, root=args.root,
                                     track_class=cls, packed_cache=True,
                                     det_source=args.det_source),
            train=dataclasses.replace(
                base.train, epochs=args.epochs, batch_size=4, lr=3e-4,
                lr_schedule="cosine", warmup_steps=60,
                compact_capacity=0 if args.tiny else 128))
        net = model_entry(cfg.model)
        loader = KittiPairLoader(cfg.data, seed=0,
                                 sequences=tuple(train_seqs))
        batch_iter = loader.batches(cfg.train.batch_size)
        key = jax.random.PRNGKey(0)
        state = create_train_state(net, cfg.train, key, next(batch_iter),
                                   steps_per_epoch=args.steps_per_epoch)

        def _step(s, b, r):
            ra, rd = jax.random.split(r)
            b = augment_batch(ra, b)
            return train_step(net, s, b, rd,
                              loss_weights=cfg.train.loss_weights,
                              compact_capacity=cfg.train.compact_capacity)

        step_fn = jax.jit(_step)
        t0 = time.time()
        for epoch in range(cfg.train.epochs):
            losses = []
            for _ in range(args.steps_per_epoch):
                state, metrics = step_fn(
                    state, next(batch_iter),
                    jax.random.fold_in(key, int(state.step)))
                losses.append(float(metrics["total"]))
            print(f"[{cls}] epoch {epoch}: loss {np.mean(losses):.4f}",
                  flush=True)
        train_s = time.time() - t0

        module = TrackingModule(
            net, {"params": state.params, "batch_stats": state.batch_stats},
            cfg.assoc)
        stats = track_kitti_sequences(
            module, cfg.data, os.path.join("results", "multiclass",
                                           args.det_source, cls.lower()),
            sequences=[val_seq], window=64, evaluate=True)
        m = stats["metrics"]
        row = {"mota": round(float(m.mota), 4),
               "motp": round(float(m.motp), 4),
               "ids": int(m.id_switches),
               "recall": round(float(m.recall), 4),
               "precision": round(float(m.precision), 4),
               "n_gt": int(m.n_gt),
               "train_seconds": round(train_s, 1)}
        if "hota" in stats:
            row["hota"] = round(float(stats["hota"].hota), 4)
        print(f"[{cls}] {row}", flush=True)
        results[cls] = row

    section = {
        "what": "Per-class multi-class workflow at flagship scale on the "
                "REAL streaming path: fabricated tree with 16 Car + 6 "
                "Pedestrian tracks/sequence, one short training per "
                "data.track_class, devkit+HOTA scoring of the held-out "
                "sequence per class."
                + (" NOISY detections with the full mitigation stack "
                   "(y_det + revival_window=2 + spatial gate)."
                   if noisy else " Oracle detections."),
        "command": (f"python scripts/multiclass_run.py --epochs "
                    f"{args.epochs} --steps-per-epoch "
                    f"{args.steps_per_epoch} --det-source "
                    f"{args.det_source}"),
        "tiny": args.tiny,
        "val_sequence": val_seq,
        "classes": results,
    }
    doc = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            doc = json.load(fh)
    if "classes" in doc:        # pre-section format: it was the oracle run
        doc = {"oracle": doc}
    doc[args.det_source] = section
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(f"wrote {args.out} [{args.det_source}]", flush=True)


if __name__ == "__main__":
    main()
