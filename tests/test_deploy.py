"""AOT deployment artifacts (mmmot_tpu/deploy.py, jax.export).

The exported StableHLO serve-step must reproduce the live TrackingModule
path bit-for-bit, survive a disk round-trip into a fresh loader that never
touches model code, and drive the serve CLI end-to-end (--exported)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mmmot_tpu.config import load_config

CFG_PATH = "experiments/tiny_debug/config.yaml"
H, W, M = 64, 96, 300


def _scene(rng, n_frames=4, n_dets=3):
    """Dets drifting right by 2px/frame — stable IDs under any tracker."""
    proj = np.array([[50.0, 0, W / 2, 0], [0, 50.0, H / 2, 0],
                     [0, 0, 1, 0]], np.float32)
    frames = []
    for t in range(n_frames):
        img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        cloud = np.zeros((M, 4), np.float32)
        cloud[:, 0] = rng.uniform(-8, 8, M)
        cloud[:, 1] = rng.uniform(-2, 2, M)
        cloud[:, 2] = rng.uniform(2, 30, M)
        boxes = np.stack([
            np.array([4 + 2 * t + 20 * i, 8 + 6 * i,
                      20 + 2 * t + 20 * i, 28 + 6 * i], np.float32)
            for i in range(n_dets)])
        frames.append({"image": img, "cloud": cloud, "boxes": boxes,
                       "proj": proj})
    return frames


@pytest.fixture(scope="module")
def artifact(tmp_path_factory, rng):
    """Export tiny_debug (random init, CPU platform) once per module."""
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.deploy import export_serve_step, save_artifact
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.train import create_train_state

    cfg = load_config(CFG_PATH)
    net = model_entry(cfg.model)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)
    dummy = {"crops": jnp.zeros((1, 2, N) + crop + (3,)),
             "points": jnp.zeros((1, 2, N, P, 4)),
             "point_mask": jnp.ones((1, 2, N, P), bool),
             "det_mask": jnp.ones((1, 2, N), bool)}
    state = create_train_state(net, cfg.train, jax.random.PRNGKey(7), dummy)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    exported, state0 = export_serve_step(cfg, variables, (H, W), M,
                                         platforms=("cpu",))
    out = str(tmp_path_factory.mktemp("artifact"))
    save_artifact(out, exported, variables, state0, cfg, (H, W), M)
    return {"dir": out, "cfg": cfg, "net": net, "variables": variables,
            "exported": exported, "state0": state0}


def _live_ids(art, frames):
    """Reference trajectory: the SAME serve-step math run live (traced in
    this process, never serialized) — what cli/serve.py executes."""
    import jax

    from mmmot_tpu.deploy import (_build_step, _fresh_state, _state_to_dict)
    from mmmot_tpu.tracker import TrackingModule

    cfg = art["cfg"]
    module = TrackingModule(art["net"], art["variables"], cfg.assoc)
    N = cfg.data.max_dets
    step = jax.jit(_build_step(art["net"], cfg.assoc,
                               tuple(cfg.data.crop_size),
                               cfg.data.point_len))
    state_d = _state_to_dict(_fresh_state(module, N))
    all_ids = []
    for fr in frames:
        n = len(fr["boxes"])
        boxes = np.zeros((N, 4), np.float32)
        boxes[:n] = fr["boxes"]
        mask = np.zeros((N,), bool)
        mask[:n] = True
        state_d, ids, _ = step(art["variables"], state_d, fr["image"],
                               fr["cloud"], boxes, mask, fr["proj"])
        all_ids.append(np.asarray(ids)[:n].tolist())
    return all_ids


def test_artifact_layout(artifact):
    d = artifact["dir"]
    names = set(os.listdir(d))
    assert {"serve_step.stablehlo", "weights.npz", "state0.npz",
            "manifest.json"} <= names
    man = json.load(open(os.path.join(d, "manifest.json")))
    assert man["platforms"] == ["cpu"]
    assert man["image_hw"] == [H, W] and man["cloud_points"] == M
    assert man["max_dets"] == artifact["cfg"].data.max_dets
    # the program is real StableHLO bytes, not a pickle of Python objects
    assert os.path.getsize(os.path.join(d, "serve_step.stablehlo")) > 1000


def test_deployed_matches_live_module(artifact, rng):
    """Loader path (deserialize + npz weights, zero model code) tracks the
    same scene to the same IDs as the live module."""
    from mmmot_tpu.deploy import DeployedTracker

    frames = _scene(rng)
    live = _live_ids(artifact, frames)
    trk = DeployedTracker.load(artifact["dir"])
    got = [trk.step(f["image"], f["cloud"], f["boxes"], f["proj"])[0]
           for f in frames]
    assert got == live
    # ids are valid and unique per frame (random-init weights don't link
    # reliably across frames — identity to the live path is the real check)
    for frame_ids in got:
        assert all(i >= 0 for i in frame_ids)
        assert len(set(frame_ids)) == len(frame_ids)


def test_deployed_reset_and_padding(artifact, rng):
    from mmmot_tpu.deploy import DeployedTracker

    frames = _scene(rng, n_frames=2, n_dets=2)
    trk = DeployedTracker.load(artifact["dir"])
    first = trk.step(frames[0]["image"], frames[0]["cloud"],
                     frames[0]["boxes"], frames[0]["proj"])[0]
    assert len(first) == 2 and trk.frame_idx == 1
    trk.reset()
    assert trk.frame_idx == 0
    again = trk.step(frames[0]["image"], frames[0]["cloud"],
                     frames[0]["boxes"], frames[0]["proj"])[0]
    assert again == first          # reset really drops all track state
    # a shorter cloud is padded to the manifest size, never truncated
    short = frames[1]["cloud"][: M // 2]
    ids = trk.step(frames[1]["image"], short, frames[1]["boxes"],
                   frames[1]["proj"])[0]
    assert len(ids) == 2
    with pytest.raises(ValueError):
        trk.step(frames[0]["image"], frames[0]["cloud"],
                 np.zeros((artifact["cfg"].data.max_dets + 1, 4),
                          np.float32), frames[0]["proj"])


def test_int8_artifact_roundtrip(artifact, rng, tmp_path):
    """Int8 export variant: the quant pytree (which contains a TUPLE of
    per-layer dicts) must survive the npz+manifest round-trip with its
    exact pytree structure, and the deployed int8 program must reproduce
    the live int8 step's ids."""
    import jax.numpy as jnp

    from mmmot_tpu.deploy import (DeployedTracker, export_serve_step,
                                  save_artifact)
    from mmmot_tpu.models.quantize import with_int8_appearance

    cfg = artifact["cfg"]
    crop = tuple(cfg.model.appearance.crop_size)
    calib = jnp.asarray(rng.normal(0, 1, (32,) + crop + (3,)),
                        jnp.float32)
    qvars = with_int8_appearance(artifact["variables"],
                                 cfg.model.appearance, calib)
    exported, state0 = export_serve_step(cfg, qvars, (H, W), M,
                                         platforms=("cpu",))
    out = str(tmp_path / "int8_art")
    save_artifact(out, exported, qvars, state0, cfg, (H, W), M,
                  extra={"int8": True})
    trk = DeployedTracker.load(out)
    assert trk.manifest["int8"] is True
    # Structure: the loaded weights carry the quant collection as a TUPLE.
    assert isinstance(trk._weights["quant_int8"]["layers"], tuple)
    assert trk._weights["quant_int8"]["layers"][0]["w"].dtype == np.int8

    frames = _scene(rng)
    art_q = dict(artifact, variables=qvars)
    live = _live_ids(art_q, frames)
    got = [trk.step(f["image"], f["cloud"], f["boxes"], f["proj"])[0]
           for f in frames]
    assert got == live


def test_quantize_for_inference_on_real_tree(tmp_path):
    """model.int8_appearance's calibration path: real crops from a KITTI
    tree through the device preprocessing; the quantized module's features
    stay close to float."""
    import jax
    import jax.numpy as jnp

    from tests.test_cli_track import build_kitti_tree

    from mmmot_tpu.models import model_entry
    from mmmot_tpu.models.quantize import quantize_for_inference
    from mmmot_tpu.train import create_train_state

    root = build_kitti_tree(tmp_path)
    cfg = load_config(CFG_PATH)
    import dataclasses

    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, root=root, max_dets=4, crop_size=(32, 32), point_len=16))
    net = model_entry(cfg.model)
    N, P = cfg.data.max_dets, cfg.data.point_len
    dummy = {"crops": jnp.zeros((1, 2, N, 32, 32, 3)),
             "points": jnp.zeros((1, 2, N, P, 4)),
             "point_mask": jnp.ones((1, 2, N, P), bool),
             "det_mask": jnp.ones((1, 2, N), bool)}
    state = create_train_state(net, cfg.train, jax.random.PRNGKey(0),
                               dummy)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    qvars = quantize_for_inference(variables, cfg.model, cfg.data)
    assert "quant_int8" in qvars
    assert len(qvars["quant_int8"]["layers"]) > 0


def test_export_cli_and_serve_exported(tmp_path, rng):
    """mmmot-export writes an artifact the serve CLI runs with --exported:
    full NDJSON protocol (ready/track/reset/quit) without --config."""
    from mmmot_tpu.cli.export import main as export_main

    out = str(tmp_path / "artifact")
    export_main(["--config", CFG_PATH, "--out", out, "--cpu",
                 "--shape", f"{H}x{W}x{M}", "--platforms", "cpu"])
    frames = _scene(rng, n_frames=2)
    for t, fr in enumerate(frames):
        np.savez(tmp_path / f"f{t}.npz", **fr)

    proc = subprocess.Popen(
        [sys.executable, "-m", "mmmot_tpu.cli.serve",
         "--exported", out, "--cpu", "--warmup"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        env=dict(os.environ))
    try:
        ready = json.loads(proc.stdout.readline())
        assert ready["ready"] is True and ready["exported"] is True
        assert "warmup_secs" in ready

        def rpc(obj):
            proc.stdin.write(json.dumps(obj) + "\n")
            proc.stdin.flush()
            return json.loads(proc.stdout.readline())

        r0 = rpc({"npz": str(tmp_path / "f0.npz")})
        assert r0["frame"] == 0 and len(r0["ids"]) == 3
        r1 = rpc({"npz": str(tmp_path / "f1.npz")})
        assert r1["frame"] == 1 and len(r1["ids"]) == 3
        assert rpc({"cmd": "reset"})["ok"] is True
        r2 = rpc({"npz": str(tmp_path / "f0.npz")})
        assert r2["frame"] == 0 and r2["ids"] == r0["ids"]
        assert rpc({"cmd": "quit"})["ok"] is True
    finally:
        proc.stdin.close()
        proc.wait(timeout=120)
    assert proc.returncode == 0


def test_export_cli_with_checkpoint(tmp_path, rng):
    """--load-path: the artifact carries the TRAINED weights, not the
    random init (closing the checkpoint -> deployment flow end-to-end)."""
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.cli.export import main as export_main
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.train import create_train_state
    from mmmot_tpu.train.checkpoint import save_checkpoint

    cfg = load_config(CFG_PATH)
    net = model_entry(cfg.model)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)
    dummy = {"crops": jnp.zeros((1, 2, N) + crop + (3,)),
             "points": jnp.zeros((1, 2, N, P, 4)),
             "point_mask": jnp.ones((1, 2, N, P), bool),
             "det_mask": jnp.ones((1, 2, N), bool)}
    state = create_train_state(net, cfg.train, jax.random.PRNGKey(3), dummy)
    # perturb params so the ckpt is distinguishable from ANY seed's init
    state = state.replace(
        params=jax.tree.map(lambda p: p + 0.125, state.params))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, step=1)

    out = str(tmp_path / "artifact")
    export_main(["--config", CFG_PATH, "--out", out, "--cpu",
                 "--load-path", ckpt_dir,
                 "--shape", f"{H}x{W}x{M}", "--platforms", "cpu"])

    flat = np.load(os.path.join(out, "weights.npz"))
    leaves = jax.tree_util.tree_leaves(state.params)
    stored = [flat[k] for k in flat.files if k.startswith("params")]
    # every trained param leaf appears bit-exactly in the artifact
    matched = 0
    for leaf in leaves:
        arr = np.asarray(leaf)
        if any(s.shape == arr.shape and np.array_equal(s, arr)
               for s in stored):
            matched += 1
    assert matched == len(leaves)


def test_window_export_matches_live_and_chains(tmp_path, rng):
    """The exported WINDOW program equals the live streaming pipeline per
    window, and chaining its carried state across two windows equals one
    live pass over the full sequence (the kitti_runner streaming
    contract)."""
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.deploy import (_fresh_state, _state_from_dict,
                                  _state_to_dict, export_window_step,
                                  save_artifact)
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule
    from mmmot_tpu.tracker.sequence import track_sequence_from_frames
    from mmmot_tpu.train import create_train_state

    cfg = load_config(CFG_PATH)
    net = model_entry(cfg.model)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)
    dummy = {"crops": jnp.zeros((1, 2, N) + crop + (3,)),
             "points": jnp.zeros((1, 2, N, P, 4)),
             "point_mask": jnp.ones((1, 2, N, P), bool),
             "det_mask": jnp.ones((1, 2, N), bool)}
    state = create_train_state(net, cfg.train, jax.random.PRNGKey(5), dummy)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    Wn = 3                                 # window length; sequence = 2*Wn
    frames = _scene(rng, n_frames=2 * Wn, n_dets=3)
    images = np.stack([f["image"] for f in frames])
    clouds = np.stack([f["cloud"] for f in frames])
    cloud_valid = np.ones((2 * Wn, M), bool)
    boxes = np.zeros((2 * Wn, N, 4), np.float32)
    det_mask = np.zeros((2 * Wn, N), bool)
    for t, f in enumerate(frames):
        boxes[t, :3] = f["boxes"]
        det_mask[t, :3] = True
    proj = frames[0]["proj"]

    exported, state0 = export_window_step(cfg, variables, Wn, (H, W), M,
                                          platforms=("cpu",))
    out_dir = str(tmp_path / "win_artifact")
    save_artifact(out_dir, exported, variables, state0, cfg, (H, W), M,
                  kind="window", extra={"window": Wn, "capacity": Wn * N})
    man = json.load(open(os.path.join(out_dir, "manifest.json")))
    assert man["kind"] == "window" and man["window"] == Wn

    # live single pass over the whole sequence (same capacity => same
    # compaction layout as the two chained windows' per-window capacity)
    module = TrackingModule(net, variables, cfg.assoc)
    jimages, jclouds, jboxes, jmask = (jnp.asarray(images),
                                       jnp.asarray(clouds),
                                       jnp.asarray(boxes),
                                       jnp.asarray(det_mask))
    live, _ = jax.jit(lambda v, s: track_sequence_from_frames(
        TrackingModule(net, v, cfg.assoc), jimages, jclouds, jboxes, jmask,
        proj, crop, P, cloud_valid=jnp.asarray(cloud_valid),
        compact_capacity=Wn * N, extract_chunk=32,
        state0=_state_from_dict(s), return_state=True,
        crop_window=512))(variables, _state_to_dict(_fresh_state(module,
                                                                 N)))
    live_ids = np.asarray(live["ids"])

    # chained exported windows
    call = jax.jit(exported.call)
    st = _state_to_dict(_fresh_state(module, N))
    got = []
    for w0 in (0, Wn):
        st, ids, _scores = call(variables, st, images[w0:w0 + Wn],
                                clouds[w0:w0 + Wn],
                                cloud_valid[w0:w0 + Wn],
                                boxes[w0:w0 + Wn], det_mask[w0:w0 + Wn],
                                proj)
        got.append(np.asarray(ids))
    got = np.concatenate(got)
    assert np.array_equal(got[det_mask], live_ids[det_mask])

    # the per-frame loader refuses window artifacts with a pointed error
    from mmmot_tpu.deploy import DeployedTracker

    with pytest.raises(ValueError, match="window"):
        DeployedTracker.load(out_dir)


@pytest.mark.parametrize("compact", [None, 8])
def test_multistream_step_matches_per_stream(artifact, rng, compact):
    """The vmapped multi-stream step (deploy._build_multistream_step) must
    advance each ACTIVE stream exactly like S separate per-frame steps —
    including flushes where only a subset of slots carries a frame
    (inactive lanes must leave their stream's state untouched).

    ``compact=8`` runs the compact-first variant with capacity above the
    total valid count (1+2+3 dets): no drops, so it must reproduce the
    padded path's trajectory exactly."""
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.deploy import (_build_multistream_step, _build_step,
                                  _fresh_state, _state_to_dict)
    from mmmot_tpu.tracker import TrackingModule

    cfg, net, variables = artifact["cfg"], artifact["net"], \
        artifact["variables"]
    module = TrackingModule(net, variables, cfg.assoc)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)
    S = 3
    step = jax.jit(_build_step(net, cfg.assoc, crop, P))
    multi = jax.jit(_build_multistream_step(net, cfg.assoc, crop, P,
                                            compact_capacity=compact))

    # Distinct scenes per stream (different det counts + content).
    scenes = [_scene(np.random.default_rng(100 + s), n_frames=3,
                     n_dets=1 + s) for s in range(S)]

    def padded(fr):
        n = len(fr["boxes"])
        boxes = np.zeros((N, 4), np.float32)
        boxes[:n] = fr["boxes"]
        mask = np.zeros((N,), bool)
        mask[:n] = True
        return boxes, mask, n

    # Reference: each stream stepped separately.
    ref_ids = [[] for _ in range(S)]
    for s in range(S):
        st = _state_to_dict(_fresh_state(module, N))
        for fr in scenes[s]:
            boxes, mask, n = padded(fr)
            st, ids, _ = step(variables, st, fr["image"], fr["cloud"],
                              boxes, mask, fr["proj"])
            ref_ids[s].append(np.asarray(ids)[:n].tolist())

    # Multi-stream: frame 0 flushes with ALL streams active, frame 1 with
    # only streams {0, 2} (stream 1 skips a batch), frame 2 catches
    # stream 1 up alone, then streams {0, 2} finish together.
    one0 = _state_to_dict(_fresh_state(module, N))
    states = jax.tree.map(lambda x: jnp.stack([x] * S), one0)
    bufs = {"images": np.zeros((S,) + scenes[0][0]["image"].shape,
                               np.uint8),
            "clouds": np.zeros((S,) + scenes[0][0]["cloud"].shape,
                               np.float32),
            "boxes": np.zeros((S, N, 4), np.float32),
            "det_mask": np.zeros((S, N), bool),
            "projs": np.zeros((S, 3, 4), np.float32)}
    got = [[] for _ in range(S)]
    frame_of = [0] * S

    def run_flush(active_slots):
        nonlocal states
        active = np.zeros((S,), bool)
        for s in active_slots:
            fr = scenes[s][frame_of[s]]
            boxes, mask, _n = padded(fr)
            bufs["images"][s] = fr["image"]
            bufs["clouds"][s] = fr["cloud"]
            bufs["boxes"][s] = boxes
            bufs["det_mask"][s] = mask
            bufs["projs"][s] = fr["proj"]
            active[s] = True
        states, ids, _ = multi(variables, states, jnp.asarray(active),
                               jnp.asarray(bufs["images"]),
                               jnp.asarray(bufs["clouds"]),
                               jnp.asarray(bufs["boxes"]),
                               jnp.asarray(bufs["det_mask"]),
                               jnp.asarray(bufs["projs"]))
        ids = np.asarray(ids)
        for s in active_slots:
            n = len(scenes[s][frame_of[s]]["boxes"])
            got[s].append(ids[s, :n].tolist())
            frame_of[s] += 1
        # Inactive slots answer -1 everywhere.
        for s in set(range(S)) - set(active_slots):
            assert (ids[s] == -1).all()

    run_flush([0, 1, 2])
    run_flush([0, 2])
    run_flush([1])
    run_flush([0, 2])
    run_flush([1])

    assert got == ref_ids, (got, ref_ids)


def test_multistream_compact_overflow_drops_valid_first(artifact, rng):
    """Compact capacity BELOW the batch's valid count: the valid-first
    gather keeps the first (stream, slot) pairs in flat order and drops
    the overflow — dropped detections answer -1 exactly like padding,
    streams whose detections all fit are tracked identically to the
    uncompacted step."""
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.deploy import (_build_multistream_step, _build_step,
                                  _fresh_state, _state_to_dict)
    from mmmot_tpu.tracker import TrackingModule

    cfg, net, variables = artifact["cfg"], artifact["net"], \
        artifact["variables"]
    module = TrackingModule(net, variables, cfg.assoc)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)
    S = 3
    # Streams carry 1, 2, 3 dets; capacity 4 keeps stream 0's det,
    # stream 1's two, stream 2's first — and drops stream 2's last two.
    C = 4
    step = jax.jit(_build_step(net, cfg.assoc, crop, P))
    multi = jax.jit(_build_multistream_step(net, cfg.assoc, crop, P,
                                            compact_capacity=C))
    scenes = [_scene(np.random.default_rng(100 + s), n_frames=1,
                     n_dets=1 + s) for s in range(S)]

    def padded(fr):
        n = len(fr["boxes"])
        boxes = np.zeros((N, 4), np.float32)
        boxes[:n] = fr["boxes"]
        mask = np.zeros((N,), bool)
        mask[:n] = True
        return boxes, mask, n

    one0 = _state_to_dict(_fresh_state(module, N))
    states = jax.tree.map(lambda x: jnp.stack([x] * S), one0)
    ins = {k: np.stack(v) for k, v in {
        "images": [s[0]["image"] for s in scenes],
        "clouds": [s[0]["cloud"] for s in scenes],
        "projs": [s[0]["proj"] for s in scenes]}.items()}
    boxes = np.zeros((S, N, 4), np.float32)
    mask = np.zeros((S, N), bool)
    for s in range(S):
        b, m, _ = padded(scenes[s][0])
        boxes[s], mask[s] = b, m
    _, ids, _ = multi(variables, states, jnp.ones((S,), bool),
                      jnp.asarray(ins["images"]), jnp.asarray(ins["clouds"]),
                      jnp.asarray(boxes), jnp.asarray(mask),
                      jnp.asarray(ins["projs"]))
    ids = np.asarray(ids)

    # Dropped: stream 2 slots 1, 2 (flat order overflow) + all padding.
    assert (ids[2, 1:] == -1).all()
    # Kept detections got real ids.
    assert (ids[0, :1] >= 0).all()
    assert (ids[1, :2] >= 0).all()
    assert ids[2, 0] >= 0

    # Streams that fully fit match the uncompacted per-stream step.
    for s in (0, 1):
        st = _state_to_dict(_fresh_state(module, N))
        b, m, n = padded(scenes[s][0])
        _, ref, _ = step(variables, st, scenes[s][0]["image"],
                         scenes[s][0]["cloud"], b, m,
                         scenes[s][0]["proj"])
        assert ids[s, :n].tolist() == np.asarray(ref)[:n].tolist()
