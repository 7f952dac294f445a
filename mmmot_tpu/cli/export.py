"""Export the serving step as an AOT deployment artifact (jax.export).

TPU-native replacement for the reference's "ship the code + .pth.tar"
deployment (SURVEY §5.4): one directory holds the StableHLO program of the
complete per-frame tracking step, its weights, the initial tracker state
and a manifest — a serving process loads it with ``DeployedTracker.load``
(or ``mmmot-serve --exported DIR``) and never touches the model zoo.

    mmmot-export --config experiments/full_mmmot/config.yaml \
        --load-path ckpts/best --out artifacts/full_mmmot \
        --shape 384x1248x16384 --platforms cpu,tpu
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="export the tracking serve step as an AOT artifact")
    p.add_argument("--config", required=True)
    p.add_argument("--load-path", default=None,
                   help="orbax checkpoint to export (random init if unset "
                        "— useful only for pipeline tests)")
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--shape", default="384x1248x16384",
                   help="HxWxM image/cloud shape the program is built for "
                        "(static under XLA; KITTI default)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets; no device of "
                        "the target platform is required.  The fused "
                        "Pallas affinity kernel is baked in only for a "
                        "tpu-ONLY export (it has no CPU lowering); "
                        "multi-platform artifacts use the XLA affinity "
                        "modules (identical results)")
    p.add_argument("--window", type=int, default=None, metavar="W",
                   help="export the WINDOW program instead of the "
                        "per-frame serve step: one call tracks W frames "
                        "of raw inputs through the compact-first "
                        "streaming pipeline and returns the carried "
                        "state (chain calls for any sequence length)")
    p.add_argument("--capacity", type=int, default=None,
                   help="compact-first extraction capacity: for --window "
                        "(default W * max_dets — every slot) and for "
                        "--streams (default None — extract all S * "
                        "max_dets padded slots; set ~S x the p99 "
                        "per-stream detection count to cut the trunk's "
                        "padding bill, overflow detections drop)")
    p.add_argument("--streams", type=int, default=None, metavar="S",
                   help="export the MULTI-STREAM program instead: one call "
                        "advances up to S concurrent streams' frames (a "
                        "per-slot active mask; inactive slots carry their "
                        "state unchanged) — how several cameras realize "
                        "the batched per-frame rate (mmmot-serve "
                        "--streams drives it live)")
    p.add_argument("--int8", action="store_true",
                   help="quantize the appearance trunk to int8 before "
                        "export (also enabled by the config's "
                        "model.int8_appearance): the int8 graph + int8 "
                        "weights are baked into the artifact.  Calibrates "
                        "on real crops from --calib-root (default: the "
                        "config's data.root)")
    p.add_argument("--calib-root", default=None,
                   help="KITTI tree for --int8 calibration crops")
    p.add_argument("--cpu", action="store_true",
                   help="run the exporting process itself on CPU")
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

    from mmmot_tpu.config import load_config
    from mmmot_tpu.deploy import (export_serve_step, export_window_step,
                                  save_artifact)
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.train import create_train_state
    from mmmot_tpu.train.checkpoint import restore_checkpoint

    cfg = load_config(args.config)
    h, w, m = (int(x) for x in args.shape.split("x"))
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s)

    net = model_entry(cfg.model)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)
    dummy = {"crops": jnp.zeros((1, 2, N) + crop + (3,)),
             "points": jnp.zeros((1, 2, N, P, 4)),
             "point_mask": jnp.ones((1, 2, N, P), bool),
             "det_mask": jnp.ones((1, 2, N), bool)}
    state = create_train_state(net, cfg.train, jax.random.PRNGKey(0), dummy)
    if args.load_path:
        state = restore_checkpoint(args.load_path, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    int8 = args.int8 or cfg.model.int8_appearance
    if int8:
        import dataclasses
        import os

        from mmmot_tpu.models.quantize import quantize_for_inference

        data_cfg = cfg.data
        if args.calib_root:
            data_cfg = dataclasses.replace(data_cfg, root=args.calib_root)
        if not os.path.isdir(data_cfg.root):
            raise SystemExit(
                f"--int8 needs real calibration crops: no KITTI tree at "
                f"{data_cfg.root!r} (point --calib-root at one)")
        variables = quantize_for_inference(variables, cfg.model, data_cfg)
        print(f"int8 appearance trunk calibrated on {data_cfg.root}")

    if args.window and args.streams:
        raise SystemExit("--window and --streams are mutually exclusive")
    if args.streams:
        from mmmot_tpu.deploy import export_multistream_step

        exported, state0 = export_multistream_step(
            cfg, variables, args.streams, (h, w), m, platforms=platforms,
            compact_capacity=args.capacity)
        save_artifact(args.out, exported, variables, state0, cfg, (h, w),
                      m, kind="multistream_step",
                      extra={"streams": args.streams, "int8": int8,
                             "compact_capacity": args.capacity})
        what = f"multistream({args.streams}) step"
    elif args.window:
        exported, state0 = export_window_step(
            cfg, variables, args.window, (h, w), m,
            capacity=args.capacity, platforms=platforms)
        save_artifact(args.out, exported, variables, state0, cfg, (h, w),
                      m, kind="window",
                      extra={"window": args.window,
                             "capacity": (args.capacity
                                          or args.window * N),
                             "int8": int8})
        what = f"window({args.window}) step"
    else:
        exported, state0 = export_serve_step(
            cfg, variables, (h, w), m, platforms=platforms)
        save_artifact(args.out, exported, variables, state0, cfg, (h, w),
                      m, extra={"int8": int8})
        what = "serve step"
    print(f"exported {cfg.name} {what} ({'/'.join(platforms)}, "
          f"image {h}x{w}, cloud {m}, N={N}) -> {args.out}")


if __name__ == "__main__":
    main()
