"""Reproducible flagship quality run (VERDICT r1 item 10).

One command regenerates PARITY.md's headline quality table:

    python scripts/quality_run.py [--epochs 12] [--out results/quality.json]

* trains the tiny flagship-equivalent (fusion C, subabs, dual softmax,
  sensor-dropout augmentation) on synthetic sequences;
* scores synthetic-val MOTA with the devkit port — full model, dead-LiDAR,
  dead-camera (the paper's robustness story), and per-solver
  (auction/sinkhorn/greedy) stability;
* writes results/quality.json + a markdown table, and exits non-zero if
  full-model MOTA < 0.90 (the regression bar).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def evaluate(net, variables, cfg, assoc_cfg, mode="full", sequences=3,
             frames=30):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmmot_tpu.data.kitti_io import tracker_output_to_objects
    from mmmot_tpu.data.synthetic import make_synthetic_sequence
    from mmmot_tpu.eval import TrackingEvaluation
    from mmmot_tpu.tracker import TrackingModule, track_sequence

    module = TrackingModule(net, variables, assoc_cfg)
    N = cfg.data.max_dets
    P = cfg.data.point_len

    def one(c, p, pm, dm):
        return track_sequence(module, c, p, pm, dm)

    track = jax.jit(one)
    ev = TrackingEvaluation(cls="car")
    for s in range(sequences):
        world = make_synthetic_sequence(
            np.random.default_rng(1000 + s), num_frames=frames,
            num_slots=N, crop_size=cfg.data.crop_size, points_per_det=P,
            drop_prob=0.05, fp_prob=0.1)
        crops = None if mode == "dead_camera" else jnp.asarray(world.crops)
        points = None if mode == "dead_lidar" else jnp.asarray(world.points)
        out = track(crops, points, jnp.asarray(world.point_mask),
                    jnp.asarray(world.det_mask))
        ids = np.asarray(out["ids"])
        res = tracker_output_to_objects(ids, world.det_mask, world.boxes2d,
                                        world.scores)
        gt = tracker_output_to_objects(
            world.gt_ids, world.det_mask & (world.gt_ids >= 0),
            world.boxes2d)
        gtf, resf = {}, {}
        for o in gt:
            gtf.setdefault(o.frame, []).append(o)
        for o in res:
            resf.setdefault(o.frame, []).append(o)
        ev.add_sequence(gtf, resf, num_frames=frames)
    return ev.compute()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--steps-per-epoch", type=int, default=50)
    ap.add_argument("--out", default="results/quality.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        from mmmot_tpu.utils.jax_setup import force_cpu

        force_cpu()

    import dataclasses
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmmot_tpu.configs import tiny
    from mmmot_tpu.data.augment import augment_batch
    from mmmot_tpu.data.synthetic import make_training_batch
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.train import create_train_state, train_step
    from mmmot_tpu.utils.jax_setup import setup_jax

    setup_jax()
    cfg = tiny()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, epochs=args.epochs, batch_size=4, warmup_steps=50,
        lr=1e-3, lr_schedule="cosine"))
    net = model_entry(cfg.model)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    N, P = cfg.data.max_dets, cfg.data.point_len

    def next_batch():
        b = make_training_batch(rng, batch_size=cfg.train.batch_size,
                                num_slots=N, crop_size=cfg.data.crop_size,
                                points_per_det=P, drop_prob=0.1, fp_prob=0.2)
        return {k: jnp.asarray(v) for k, v in b.items()}

    batch0 = next_batch()
    state = create_train_state(net, cfg.train, key, batch0,
                               steps_per_epoch=args.steps_per_epoch)
    vars0 = {"params": state.params, "batch_stats": state.batch_stats}

    def _step(s, b, r):
        ra, rd = jax.random.split(r)
        b = augment_batch(ra, b)
        return train_step(net, s, b, rd,
                          loss_weights=cfg.train.loss_weights)

    step_fn = jax.jit(_step)

    t0 = time.time()
    for epoch in range(cfg.train.epochs):
        for _ in range(args.steps_per_epoch):
            state, metrics = step_fn(
                state, next_batch(), jax.random.fold_in(key,
                                                        int(state.step)))
        print(f"epoch {epoch}: loss {float(metrics['total']):.4f}",
              flush=True)
    train_time = time.time() - t0

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rows = {}
    rows["untrained_full"] = evaluate(net, vars0, cfg, cfg.assoc)
    rows["full"] = evaluate(net, variables, cfg, cfg.assoc)
    rows["dead_lidar"] = evaluate(net, variables, cfg, cfg.assoc,
                                  mode="dead_lidar")
    rows["dead_camera"] = evaluate(net, variables, cfg, cfg.assoc,
                                   mode="dead_camera")
    for solver in ("sinkhorn", "greedy"):
        rows[f"solver_{solver}"] = evaluate(
            net, variables, cfg,
            dataclasses.replace(cfg.assoc, solver=solver))

    report = {"train_epochs": cfg.train.epochs,
              "train_seconds": round(train_time, 1),
              "final_loss": float(metrics["total"])}
    for k, m in rows.items():
        report[k] = {"mota": round(m.mota, 4), "motp": round(m.motp, 4),
                     "ids": m.id_switches, "frag": m.fragments}

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    md = args.out.replace(".json", ".md")
    with open(md, "w") as f:
        f.write("| condition | MOTA | MOTP | IDS | FRAG |\n|---|---|---|---|---|\n")
        for k, m in rows.items():
            f.write(f"| {k} | {m.mota*100:.2f}% | {m.motp*100:.2f}% | "
                    f"{m.id_switches} | {m.fragments} |\n")
    print(json.dumps(report, indent=2))

    ok = rows["full"].mota >= 0.90
    print(f"QUALITY {'PASS' if ok else 'FAIL'}: full MOTA "
          f"{rows['full'].mota:.4f} (bar 0.90)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
