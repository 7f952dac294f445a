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
             frames=30, drop_prob=0.05, fp_prob=0.1, jitter_px=0.0,
             degrade_prob=0.0, score_threshold=0.0, full_gt=False,
             seed0=1000):
    """Devkit-score the tracker on synthetic sequences.

    ``full_gt`` scores against the TRUE object trajectories (detector
    drop-outs count as real FNs) — the non-saturated noisy-detector
    regime; otherwise GT is the detected subset (the legacy saturated
    gates).  ``score_threshold`` applies post-hoc det-head filtering;
    LP-level rejection comes from ``assoc_cfg.use_det_scores``.
    """
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

    def one(c, p, pm, dm, bx):
        # boxes feed the optional spatial gate (iou_gate/iou_weight);
        # ignored unless the assoc config enables it.
        return track_sequence(module, c, p, pm, dm, boxes=bx)

    track = jax.jit(one)
    ev = TrackingEvaluation(cls="car")
    for s in range(sequences):
        world = make_synthetic_sequence(
            np.random.default_rng(seed0 + s), num_frames=frames,
            num_slots=N, crop_size=cfg.data.crop_size, points_per_det=P,
            drop_prob=drop_prob, fp_prob=fp_prob, jitter_px=jitter_px,
            degrade_prob=degrade_prob)
        crops = None if mode == "dead_camera" else jnp.asarray(world.crops)
        points = None if mode == "dead_lidar" else jnp.asarray(world.points)
        out = track(crops, points, jnp.asarray(world.point_mask),
                    jnp.asarray(world.det_mask),
                    jnp.asarray(world.boxes2d))
        ids = np.asarray(out["ids"])
        keep = world.det_mask
        if score_threshold > 0:
            keep = keep & (np.asarray(out["det_score"])
                           >= score_threshold)
        res = tracker_output_to_objects(ids, keep, world.boxes2d,
                                        world.scores)
        if full_gt:
            K = world.gt_alive.shape[1]
            gt_ids_full = np.where(world.gt_alive,
                                   np.arange(K)[None, :], -1)
            gt = tracker_output_to_objects(gt_ids_full, world.gt_alive,
                                           world.gt_traj_boxes)
        else:
            gt = tracker_output_to_objects(
                world.gt_ids, world.det_mask & (world.gt_ids >= 0),
                world.gt_boxes2d)
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
        # fp_prob matches the noisy eval regime so the det head sees
        # enough FP supervision to separate (the geometric FP count at
        # 0.2 was ~5% of dets — too few for a discriminative head).
        b = make_training_batch(rng, batch_size=cfg.train.batch_size,
                                num_slots=N, crop_size=cfg.data.crop_size,
                                points_per_det=P, drop_prob=0.1,
                                fp_prob=0.6, degrade_prob=0.15)
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

    # Det-head diagnostic: score separation on a noisy world.
    from mmmot_tpu.data.synthetic import make_synthetic_sequence
    from mmmot_tpu.tracker import TrackingModule, track_sequence
    world = make_synthetic_sequence(
        np.random.default_rng(3000), num_frames=30, num_slots=N,
        crop_size=cfg.data.crop_size, points_per_det=P, drop_prob=0.1,
        fp_prob=0.6, jitter_px=2.0, degrade_prob=0.15)
    mdiag = TrackingModule(net, variables, cfg.assoc)
    outd = jax.jit(lambda c, p, q, d: track_sequence(mdiag, c, p, q, d))(
        jnp.asarray(world.crops), jnp.asarray(world.points),
        jnp.asarray(world.point_mask), jnp.asarray(world.det_mask))
    ds = np.asarray(outd["det_score"])
    tp_m = world.det_mask & (world.gt_ids >= 0)
    fp_m = world.det_mask & (world.gt_ids < 0)
    # Degraded TPs are identifiable by their sparse point sets (clear TPs
    # carry >= P/2 points) — classify for the diagnostic only.
    sparse = world.point_mask.sum(-1) < (P // 2)
    deg_m = tp_m & sparse
    clear_m = tp_m & ~sparse
    det_diag = {"tp_score_mean": round(float(ds[tp_m].mean()), 4),
                "clear_score_mean": round(float(ds[clear_m].mean()), 4),
                "degraded_score_mean": round(float(ds[deg_m].mean()), 4),
                "fp_score_mean": round(float(ds[fp_m].mean()), 4),
                "n_fp": int(fp_m.sum()), "n_degraded": int(deg_m.sum())}
    # New-head response per class (bias of the LP's keep-as-new arm).
    feats_d = jax.jit(lambda c, p_, q, d: net.apply(
        variables, c, p_, q, d, train=False, method=net.extract))(
        jnp.asarray(world.crops), jnp.asarray(world.points),
        jnp.asarray(world.point_mask), jnp.asarray(world.det_mask))
    prev = {k: jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]])
            for k, v in feats_d.items()}
    mprev = jnp.concatenate([jnp.zeros_like(jnp.asarray(
        world.det_mask[:1])), jnp.asarray(world.det_mask[:-1])])
    affd = net.apply(variables, prev, feats_d, mprev,
                     jnp.asarray(world.det_mask), train=False,
                     method=net.affinity)
    new_s = np.asarray(jax.nn.sigmoid(affd.new))
    det_diag.update({
        "new_s_clear": round(float(new_s[clear_m].mean()), 4),
        "new_s_degraded": round(float(new_s[deg_m].mean()), 4),
        "new_s_fp": round(float(new_s[fp_m].mean()), 4)})
    print("det head:", det_diag, flush=True)

    # Noisy-detector regime (VERDICT r2 missing #5): heavy FP rate, real
    # FNs (full-trajectory GT), box jitter — MOTA is NOT saturated here,
    # and the three FP-handling strategies must separate: no filtering <
    # post-hoc det-head threshold <= LP-level y_det rejection (the one LP
    # feature the reference always pays for; SURVEY §2.3).
    # degrade_prob puts ~20%% of TRUE detections in the ambiguous zone
    # (clutter-like stats but a live, correlating signature): a post-hoc
    # threshold drops them (FN + IDS), the LP keeps them when association
    # evidence outweighs the low det score.
    # Ambiguous-class base rate ~0.25 (FPs outnumber degraded TPs): the
    # det head scores the whole class near the base rate, BELOW the 0.5
    # threshold — post-hoc filtering wipes out the degraded TPs with the
    # FPs.  The LP can still tell them apart through link evidence.
    noise = dict(drop_prob=0.1, fp_prob=0.6, jitter_px=2.0,
                 degrade_prob=0.15, full_gt=True, sequences=4, seed0=3000)
    rows["noisy_nofilter"] = evaluate(net, variables, cfg, cfg.assoc,
                                      **noise)
    # Threshold SWEEP: the post-hoc baseline gets its best shot, so the
    # y_det comparison is against the best achievable threshold, not one
    # arbitrary knob setting.
    for thr in (0.3, 0.4, 0.5, 0.6):
        rows[f"noisy_threshold_{thr}"] = evaluate(
            net, variables, cfg, cfg.assoc, score_threshold=thr, **noise)
    rows["noisy_threshold"] = max(
        (rows[f"noisy_threshold_{t}"] for t in (0.3, 0.4, 0.5, 0.6)),
        key=lambda m: m.mota)
    # det_score_weight balances det evidence against the (0..1) link and
    # new/end scores in the LP.  Too small and the trained new-head (which
    # scores FPs "new" — they ARE new under the training labels) vetoes
    # every rejection; too large and the LP degenerates to hard
    # thresholding.  0.5 lets association evidence save linked ambiguous
    # detections while unlinked low-scores still reject — the point of
    # carrying y_det INSIDE the LP (the raw-logit variant below carries
    # full weight 1.0 because raw new/end logits are on the same scale).
    rows["noisy_ydet"] = evaluate(
        net, variables, cfg,
        dataclasses.replace(cfg.assoc, use_det_scores=True,
                            det_score_weight=0.5), **noise)
    # Raw new/end logits in the LP: the learned negativity of the birth
    # head on clutter-like dets gives the reject arm real teeth (sigmoid
    # scores are >= 0, which biases the LP toward keeping).
    rows["noisy_ydet_raw"] = evaluate(
        net, variables, cfg,
        dataclasses.replace(cfg.assoc, use_det_scores=True,
                            det_score_weight=1.0, raw_new_end=True),
        **noise)
    # Track revival: detector dropouts (drop_prob) are the dominant IDS
    # source in this regime; a 2-frame ghost window revives IDs across
    # them (capability beyond the reference's strictly-adjacent tracker).
    rows["noisy_ydet_revival"] = evaluate(
        net, variables, cfg,
        dataclasses.replace(cfg.assoc, use_det_scores=True,
                            det_score_weight=1.0, raw_new_end=True,
                            revival_window=2), **noise)
    # Spatial gate (TPU-native addition; the reference associates on
    # appearance only): a soft IoU prior + hard floor on top of the best
    # LP configuration — box continuity disambiguates appearance-ambiguous
    # clutter and vetoes teleport links outright.
    rows["noisy_ydet_gate"] = evaluate(
        net, variables, cfg,
        dataclasses.replace(cfg.assoc, use_det_scores=True,
                            det_score_weight=1.0, raw_new_end=True,
                            iou_weight=1.0, iou_gate=0.1), **noise)
    rows["noisy_ydet_revival_gate"] = evaluate(
        net, variables, cfg,
        dataclasses.replace(cfg.assoc, use_det_scores=True,
                            det_score_weight=1.0, raw_new_end=True,
                            revival_window=2,
                            iou_weight=1.0, iou_gate=0.1), **noise)

    report = {"train_epochs": cfg.train.epochs,
              "train_seconds": round(train_time, 1),
              "final_loss": float(metrics["total"]),
              "det_head": det_diag}
    for k, m in rows.items():
        report[k] = {"mota": round(m.mota, 4), "motp": round(m.motp, 4),
                     "ids": m.id_switches, "frag": m.fragments,
                     "tp": m.tp, "fp": m.fp, "fn": m.fn}

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
    # Noisy-regime bar: y_det LP rejection (raw new/end logits in the LP)
    # must beat unfiltered output AND the BEST post-hoc threshold from the
    # sweep.  It does so structurally: at the same detection operating
    # point it avoids the ID switches post-hoc filtering causes, because
    # reject/keep is decided JOINTLY with association (the reference's
    # rationale for carrying y_det inside the ILP; SURVEY §2.3).
    noisy_ok = (rows["noisy_ydet_raw"].mota > rows["noisy_nofilter"].mota
                and rows["noisy_ydet_raw"].mota
                > rows["noisy_threshold"].mota)
    print(f"QUALITY {'PASS' if ok else 'FAIL'}: full MOTA "
          f"{rows['full'].mota:.4f} (bar 0.90)")
    print(f"NOISY   {'PASS' if noisy_ok else 'FAIL'}: nofilter "
          f"{rows['noisy_nofilter'].mota:.4f} | best threshold "
          f"{rows['noisy_threshold'].mota:.4f} | y_det(sigmoid) "
          f"{rows['noisy_ydet'].mota:.4f} | y_det(raw) "
          f"{rows['noisy_ydet_raw'].mota:.4f} "
          f"(IDS {rows['noisy_ydet_raw'].id_switches} vs "
          f"{rows['noisy_threshold'].id_switches} at the same TP/FP "
          f"operating point)")
    return 0 if (ok and noisy_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
