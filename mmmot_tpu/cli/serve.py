"""Online tracking service — newline-delimited JSON over stdin/stdout.

Production-serving surface for the tracker: a long-lived process holds the
model + tracker state on device and answers one request per frame, keeping
the per-frame online semantics of the reference's TrackingModule.predict.

Protocol (one JSON object per line):

  request:  {"npz": "/path/to/frame.npz"}        # arrays for one frame
            {"cmd": "reset"}                      # drop all tracks
            {"cmd": "quit"}
  response: {"ids": [...], "frame": k}            # track id per det slot
            {"ok": true}                          # for commands
            {"error": "..."}

The npz carries: image [H, W, 3] uint8, cloud [M, 4] float32, boxes [n, 4]
float32, proj [3, 4] float32 (optional score [n]).  Detections are padded
to the config's ``max_dets`` internally; ids align with the input order.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="mmmot_tpu tracking service")
    p.add_argument("--config", default=None,
                   help="experiment config (required unless --exported)")
    p.add_argument("--load-path", default=None)
    p.add_argument("--exported", default=None,
                   help="serve an AOT artifact directory (mmmot-export) "
                        "instead of building the model: the StableHLO "
                        "program + weights are loaded as-is — no model "
                        "code, no re-trace, no checkpoint restore")
    p.add_argument("--warmup", action="store_true",
                   help="compile the per-frame step at startup (on dummy "
                        "arrays of --warmup-shape) so the first client "
                        "request doesn't pay the full pipeline compile; "
                        "the ready line is emitted only after warmup")
    p.add_argument("--warmup-shape", default="384x1248x16384",
                   help="HxWxM of the warmup frame/cloud (KITTI default); "
                        "requests with other image/cloud shapes still "
                        "trigger their own compile")
    p.add_argument("--streams", type=int, default=1, metavar="S",
                   help="MULTI-STREAM serving: micro-batch up to S "
                        "concurrent streams' frames into one vmapped step "
                        "(per-stream carried tracker state; requests "
                        "carry a \"stream\" id).  A batch flushes when S "
                        "distinct streams are pending, when a second "
                        "frame arrives for a pending stream (in-stream "
                        "order is a state dependency), or when "
                        "--flush-ms elapses — batched steps are ~3x "
                        "cheaper per frame than single-stream steps "
                        "(docs/PERFORMANCE.md serving rule)")
    p.add_argument("--flush-ms", type=float, default=6.0,
                   help="latency budget: max milliseconds a pending frame "
                        "waits for more streams before the batch flushes")
    p.add_argument("--compact", type=int, default=None, metavar="C",
                   help="multi-stream compact capacity: extract features "
                        "for at most C detections ACROSS the batch "
                        "(valid-first; overflow detections are dropped, "
                        "ids -1) instead of all S*N padded slots — the "
                        "trunk is ~77%% of the step, so C ~= S x the "
                        "p99 per-stream detection count cuts most of "
                        "the padding bill (docs/PERFORMANCE.md "
                        "multi-stream section)")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def _serve_exported(args):
    """Protocol loop over an AOT artifact (mmmot-export): the deserialized
    StableHLO program IS the tracker — no model build, no re-trace."""
    import time

    import numpy as np

    from mmmot_tpu.deploy import DeployedTracker

    trk = DeployedTracker.load(args.exported)
    man = trk.manifest
    ready = {"ready": True, "config": man.get("config", "?"),
             "exported": True, "platforms": man.get("platforms")}
    if args.warmup:
        h, w = man["image_hw"]
        t0 = time.perf_counter()
        trk.step(np.zeros((h, w, 3), np.uint8),
                 np.zeros((man["cloud_points"], 4), np.float32),
                 np.zeros((1, 4), np.float32),
                 np.zeros((3, 4), np.float32))
        trk.reset()
        ready["warmup_secs"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(ready), flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if req.get("cmd") == "quit":
                print(json.dumps({"ok": True}), flush=True)
                break
            if req.get("cmd") == "reset":
                trk.reset()
                print(json.dumps({"ok": True}), flush=True)
                continue
            data = np.load(req["npz"])
            frame = trk.frame_idx
            ids, _scores = trk.step(data["image"], data["cloud"],
                                    data["boxes"], data["proj"])
            print(json.dumps({"frame": frame, "ids": ids}), flush=True)
        except Exception as e:  # noqa: BLE001 — service must keep running
            print(json.dumps({"error": f"{type(e).__name__}: {e}"}),
                  flush=True)


def _serve_multistream(args, cfg, net, module):
    """Micro-batched multi-stream protocol loop (``--streams S``).

    Requests carry ``"stream": <id>`` (default 0).  Pending frames from
    distinct streams batch into ONE vmapped step (deploy.py
    ``_build_multistream_step``); a batch flushes when S streams are
    pending, when a second frame arrives for an already-pending stream
    (in-stream order is a state dependency), or when ``--flush-ms``
    elapses.  Responses land in request order, tagged with the stream id.
    """
    import queue
    import threading
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmmot_tpu.deploy import (_build_multistream_step, _fresh_state,
                                  _state_to_dict)

    S = args.streams
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)
    multi = jax.jit(_build_multistream_step(
        net, cfg.assoc, crop, P, compact_capacity=args.compact),
        donate_argnums=(1,))

    def fresh_one():
        return jax.device_put(_state_to_dict(_fresh_state(module, N)))

    def fresh_all():
        one = _state_to_dict(_fresh_state(module, N))
        return jax.device_put(jax.tree.map(
            lambda x: jnp.stack([x] * S), one))

    states = fresh_all()
    slots: dict = {}          # stream id -> slot index
    frame_idx = [0] * S

    # Reused host staging buffers; inactive slots keep stale/zero content
    # (their lanes are discarded by the active mask).
    h = w = m = None
    bufs = None

    def ensure_bufs(image, cloud):
        nonlocal h, w, m, bufs
        if bufs is None:
            h, w, _ = image.shape
            m = cloud.shape[0]
            bufs = {
                "images": np.zeros((S, h, w, 3), np.uint8),
                "clouds": np.zeros((S, m, 4), np.float32),
                "boxes": np.zeros((S, N, 4), np.float32),
                "det_mask": np.zeros((S, N), bool),
                "projs": np.zeros((S, 3, 4), np.float32),
            }
        elif image.shape != (h, w, 3) or cloud.shape[0] != m:
            raise ValueError(
                f"multi-stream serving batches one static shape: got "
                f"image {image.shape} / cloud {cloud.shape}, program is "
                f"{(h, w, 3)} / {(m, 4)}")

    pending: dict = {}        # slot -> (req_order, stream_id, n_dets)
    order: list = []          # request arrival order: (slot, stream, n)

    def flush():
        nonlocal states
        if not order:
            return
        active = np.zeros((S,), bool)
        for slot, _sid, _n in order:
            active[slot] = True
        states, ids, _scores = multi(
            module.variables, states, jnp.asarray(active),
            jnp.asarray(bufs["images"]), jnp.asarray(bufs["clouds"]),
            jnp.asarray(bufs["boxes"]), jnp.asarray(bufs["det_mask"]),
            jnp.asarray(bufs["projs"]))
        ids = np.asarray(ids)
        for slot, sid, n in order:
            print(json.dumps({"stream": sid, "frame": frame_idx[slot],
                              "ids": ids[slot, :n].tolist()}), flush=True)
            frame_idx[slot] += 1
        pending.clear()
        order.clear()

    if args.warmup:
        hh, ww, mm = (int(x) for x in args.warmup_shape.split("x"))
        ensure_bufs(np.zeros((hh, ww, 3), np.uint8),
                    np.zeros((mm, 4), np.float32))
        t0 = time.perf_counter()
        states, _ids, _sc = multi(
            module.variables, states, jnp.zeros((S,), bool),
            jnp.asarray(bufs["images"]), jnp.asarray(bufs["clouds"]),
            jnp.asarray(bufs["boxes"]), jnp.asarray(bufs["det_mask"]),
            jnp.asarray(bufs["projs"]))
        jax.block_until_ready(states["ids"])
        print(json.dumps({"ready": True, "config": cfg.name, "streams": S,
                          "warmup_secs": round(time.perf_counter() - t0,
                                               3)}), flush=True)
    else:
        print(json.dumps({"ready": True, "config": cfg.name,
                          "streams": S}), flush=True)

    lines: queue.Queue = queue.Queue()

    def reader():
        for line in sys.stdin:
            lines.put(line)
        lines.put(None)

    threading.Thread(target=reader, daemon=True).start()
    deadline = None
    while True:
        timeout = (None if deadline is None
                   else max(0.0, deadline - time.perf_counter()))
        try:
            line = lines.get(timeout=timeout)
        except queue.Empty:   # latency budget expired
            flush()
            deadline = None
            continue
        if line is None:
            flush()
            break
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if req.get("cmd") == "quit":
                flush()
                print(json.dumps({"ok": True}), flush=True)
                break
            if req.get("cmd") == "reset":
                flush()
                sid = req.get("stream")
                if sid is None:
                    states = fresh_all()
                    slots.clear()
                    frame_idx[:] = [0] * S
                elif sid in slots:
                    slot = slots[sid]
                    states = jax.tree.map(
                        lambda st, fr: st.at[slot].set(fr), states,
                        fresh_one())
                    frame_idx[slot] = 0
                print(json.dumps({"ok": True}), flush=True)
                deadline = None if not order else deadline
                continue
            sid = req.get("stream", 0)
            if sid not in slots:
                if len(slots) >= S:
                    raise ValueError(
                        f"stream {sid!r}: all {S} stream slots in use "
                        "(raise --streams or reset)")
                slots[sid] = len(slots)
            slot = slots[sid]
            if slot in pending:
                # In-stream order is a state dependency: flush first.
                flush()
                deadline = None
            data = np.load(req["npz"])
            boxes = np.asarray(data["boxes"], np.float32)
            n = len(boxes)
            if n > N:
                raise ValueError(f"{n} detections > max_dets {N}")
            image = np.asarray(data["image"], np.uint8)
            cloud = np.asarray(data["cloud"], np.float32)
            ensure_bufs(image, cloud)
            bufs["images"][slot] = image
            bufs["clouds"][slot] = cloud
            bufs["boxes"][slot] = 0.0
            bufs["boxes"][slot, :n] = boxes
            bufs["det_mask"][slot] = False
            bufs["det_mask"][slot, :n] = True
            bufs["projs"][slot] = np.asarray(data["proj"], np.float32)
            pending[slot] = True
            order.append((slot, sid, n))
            if len(order) == 1:
                deadline = time.perf_counter() + args.flush_ms / 1e3
            if len(pending) == S:
                flush()
                deadline = None
        except Exception as e:  # noqa: BLE001 — service must keep running
            print(json.dumps({"error": f"{type(e).__name__}: {e}"}),
                  flush=True)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        from mmmot_tpu.utils.jax_setup import force_cpu

        force_cpu()
    from mmmot_tpu.utils.jax_setup import setup_jax

    setup_jax()

    if args.exported:
        _serve_exported(args)
        return
    if not args.config:
        raise SystemExit("--config is required unless --exported is given")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmmot_tpu.config import load_config
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.ops.crop_resize import (crop_and_resize_batched,
                                           normalize_crops)
    from mmmot_tpu.ops.frustum import frustum_sample_batched
    from mmmot_tpu.tracker import TrackingModule
    from mmmot_tpu.train import create_train_state
    from mmmot_tpu.train.checkpoint import restore_checkpoint

    cfg = load_config(args.config)
    net = model_entry(cfg.model)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)

    key = jax.random.PRNGKey(0)
    dummy = {"crops": jnp.zeros((1, 2, N) + crop + (3,)),
             "points": jnp.zeros((1, 2, N, P, 4)),
             "point_mask": jnp.ones((1, 2, N, P), bool),
             "det_mask": jnp.ones((1, 2, N), bool)}
    state = create_train_state(net, cfg.train, key, dummy)
    if args.load_path:
        state = restore_checkpoint(args.load_path, state)
    module = TrackingModule(
        net, {"params": state.params, "batch_stats": state.batch_stats},
        cfg.assoc)

    if args.streams > 1:
        _serve_multistream(args, cfg, net, module)
        return

    # ``vars_`` is a jit ARGUMENT (not closed over): a closed-over device
    # pytree is fetched d2h at trace time to embed as MLIR literals — minutes
    # under a stalled axon tunnel, and it bloats the program (bench.py
    # learned the same lesson; see docs/PERFORMANCE.md).
    @jax.jit
    def step_fn(vars_, track_state, image, cloud, boxes, det_mask, proj):
        mod = TrackingModule(net, vars_, cfg.assoc)
        crops = crop_and_resize_batched(
            image.astype(jnp.float32)[None], boxes[None], crop,
            det_mask[None], method="mxu")[0]
        crops = normalize_crops(crops, scale=1.0 / 255.0)
        pts, pmask = frustum_sample_batched(
            cloud[None], boxes[None], proj, P, det_mask=det_mask[None])
        feats = mod.extract(crops, pts[0], pmask[0], det_mask)
        if mod.carry_boxes:   # gate / coverage / motion affinity read them
            feats["box"] = boxes.astype(jnp.float32)
        new_state, out = mod.step_from_feats(track_state, feats, det_mask)
        return new_state, out["ids"]

    def step(track_state, *args):
        return step_fn(module.variables, track_state, *args)

    def fresh_state():
        ts = module.init_state(N)
        cdt = (jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16"
               else jnp.float32)
        return ts._replace(
            feats={k: (v if k == "box" else v.astype(cdt))
                   for k, v in ts.feats.items()})

    ready = {"ready": True, "config": cfg.name}
    if args.warmup:
        import time

        h, w, m = (int(x) for x in args.warmup_shape.split("x"))
        t0 = time.perf_counter()
        ws, wids = step(fresh_state(), jnp.zeros((h, w, 3), jnp.uint8),
                        jnp.zeros((m, 4), jnp.float32),
                        jnp.zeros((N, 4), jnp.float32),
                        jnp.zeros((N,), bool), jnp.zeros((3, 4), jnp.float32))
        jax.block_until_ready(wids)
        ready["warmup_secs"] = round(time.perf_counter() - t0, 3)

    track_state = None
    frame_idx = 0
    out = sys.stdout
    print(json.dumps(ready), flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if req.get("cmd") == "quit":
                print(json.dumps({"ok": True}), flush=True)
                break
            if req.get("cmd") == "reset":
                track_state = None
                frame_idx = 0
                print(json.dumps({"ok": True}), flush=True)
                continue
            data = np.load(req["npz"])
            boxes = np.asarray(data["boxes"], np.float32)
            n = len(boxes)
            if n > N:
                raise ValueError(f"{n} detections > max_dets {N}")
            boxes_p = np.zeros((N, 4), np.float32)
            boxes_p[:n] = boxes
            det_mask = np.zeros((N,), bool)
            det_mask[:n] = True
            if track_state is None:
                track_state = fresh_state()
            track_state, ids = step(
                track_state, jnp.asarray(data["image"]),
                jnp.asarray(data["cloud"]), jnp.asarray(boxes_p),
                jnp.asarray(det_mask), jnp.asarray(data["proj"]))
            print(json.dumps({"frame": frame_idx,
                              "ids": np.asarray(ids)[:n].tolist()}),
                  flush=True)
            frame_idx += 1
        except Exception as e:  # noqa: BLE001 — service must keep running
            print(json.dumps({"error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
