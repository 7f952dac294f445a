"""Benchmark: KITTI-scale tracking throughput on one chip.

Runs the flagship streaming pipeline end-to-end from RAW frames:
compact-first on-device per-detection crop extraction + frustum point
sampling (fused XLA preprocessing), VGG16-bn skip-pool appearance + PointNet
features, attention fusion, affinity/new/end heads, and in-graph auction
association — the whole sequence batch is one compiled program with no host
round-trips.

Workload: S sequences x T frames of full camera frames (uint8, KITTI-sized),
LiDAR clouds of M points, N padded detection slots with KITTI-like valid
density.  The default operating point is the REFERENCE-FAITHFUL scale (crop
224, point_len 512 — SURVEY.md §2.5/§2.6) with the INT8 appearance trunk
(the sanctioned serving point: measured metric-identical quality at 1.35x
the bf16 throughput — results/real_tree_quality.json); the same run also
times the bf16 program once and records ``config.bf16_fps``, and
MMMOT_BENCH_INT8=0 makes bf16 the primary instead.  Override scale via env
for experiments.  ``vs_baseline`` compares against the reference's ~50 FPS
single-GPU online tracker (KITTI leaderboard runtime ~0.02 s/frame,
BASELINE.md).

Harness-robustness design (round-2 verdict: the driver's bench run timed out
while the framework itself was healthy — the axon device tunnel stalls for
minutes on large host<->device transfers):

* the big arrays (frames ~740 MB, clouds ~130 MB) are generated ON DEVICE by
  a tiny jitted program — only KBs of boxes/masks cross the tunnel;
* staged heartbeat lines go to stderr (imported / inited / generated /
  compiled / each run), so a timeout tail pinpoints the stalled stage;
* a wall-clock deadline (MMMOT_BENCH_DEADLINE, default 420 s) trims the
  timed-run count so the final JSON line always lands before the driver's
  kill; at least one post-compile run is always timed.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} on
stdout (heartbeats are stderr-only).

Env knobs: MMMOT_BENCH_{S,T,N,P,CROP,CHUNK,COMPACT,CROP_WINDOW,SOLVER,
RUNS,DEADLINE,PROFILE}; MMMOT_BENCH_DET=1 benchmarks the reference-faithful
full-ILP mode (y_det detection-confidence variables in the LP -> sequential
scan; SURVEY.md §2.3/§3.2) instead of the parallel-presolve flagship.
"""

from __future__ import annotations

import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

# SIGUSR1 dumps all-thread Python tracebacks to stderr: the axon tunnel can
# stall any single RPC for minutes, and this is the only way to see *which*
# call a wedged bench is sitting in (no py-spy/gdb in the image).
faulthandler.register(signal.SIGUSR1, file=sys.stderr)

BASELINE_FPS = 50.0  # reference: ~0.02 s/frame on GPU (BASELINE.md)

# Workload shape (KITTI-like); overridable for experiments via env.
S = int(os.environ.get("MMMOT_BENCH_S", 8))
# T = streaming-window length (the KITTI runner's --window knob; state is
# carried across windows so any window length yields identical results).
# With the workload generated ON DEVICE the old T=64 optimum turned out to
# be a host-generation artifact; re-swept on-chip: T=64: 415.6, 128: 430.0,
# 256: 445.4, 512: 454.6 FPS.  Default 512 — the knee of the sweep, still
# inside real KITTI sequence lengths (~200-1100 frames); past it returns
# diminish while the workload HBM footprint keeps doubling.
T = int(os.environ.get("MMMOT_BENCH_T", 512))
N = int(os.environ.get("MMMOT_BENCH_N", 32))
P = int(os.environ.get("MMMOT_BENCH_P", 512))
H, W, M = 384, 1248, 16384
CROP = int(os.environ.get("MMMOT_BENCH_CROP", 224))
# Chunk the crop+conv stage so activations stay in HBM comfortably
# (S*CHUNK crops per conv step).
CHUNK = int(os.environ.get("MMMOT_BENCH_CHUNK", 32)) or None
# Crop band width: must cover the widest box; sized from the workload via
# the same helper the KITTI runner uses (0 = derive from boxes).
CROP_WINDOW = int(os.environ.get("MMMOT_BENCH_CROP_WINDOW", 0))
# Reference-faithful full-ILP mode: y_det vars in the LP, sequential scan.
DET_MODE = os.environ.get("MMMOT_BENCH_DET", "") not in ("", "0")
# Quality-stack knobs (the noisy-regime winner is y_det + revival_window=2
# + spatial gate — results/real_tree_quality.json): K ghost slots / IoU
# gate+prior on the link scores.  Both ride the ghost-pool hybrid pre-solve
# (tracker/sequence.py::_revival_track), so the banded affinity still runs
# as big batched matmuls and only gathers + heads + the LP stay sequential.
REVIVAL = int(os.environ.get("MMMOT_BENCH_REVIVAL", 0))
GATE_MODE = os.environ.get("MMMOT_BENCH_GATE", "") not in ("", "0")
# Int8-quantized appearance trunk (models/quantize.py): the DEFAULT
# serving point since round 4 — the MXU runs int8 at 2x bf16, the conv
# stack is ~85% of this pipeline, and the quality price was measured to be
# ZERO on the noisy real-tree regime (metric-identical rows in
# results/real_tree_quality.json; association decisions are discrete and
# quantization flipped none).  MMMOT_BENCH_INT8=0 benches the bf16
# reference-faithful point instead; the default run ALSO times the bf16
# program once and records it as config.bf16_fps so both numbers land in
# one JSON line.
INT8_MODE = os.environ.get("MMMOT_BENCH_INT8", "1") not in ("", "0")
# Space-to-depth stem (AppearanceConfig.s2d_stem): the TPU stem redesign —
# NOT the reference architecture (retrained quality priced in
# results/real_tree_quality.json s2d rows); benches the same pipeline with
# the stage-1 convs at half resolution.
S2D_MODE = os.environ.get("MMMOT_BENCH_S2D", "") not in ("", "0")
# Debug/smoke runs off-TPU ("" and "0" both mean the normal TPU path).
CPU_MODE = os.environ.get("MMMOT_BENCH_CPU", "") not in ("", "0")
N_RUNS = int(os.environ.get("MMMOT_BENCH_RUNS", 3))
DEADLINE = float(os.environ.get("MMMOT_BENCH_DEADLINE", 420.0))

_T0 = time.perf_counter()
_STAGES: dict = {}


def hb(stage: str, msg: str = "") -> None:
    """Heartbeat: stage marker + elapsed wall-clock on stderr."""
    el = time.perf_counter() - _T0
    _STAGES[stage] = round(el, 2)
    print(f"[bench +{el:7.1f}s] {stage}{': ' if msg else ''}{msg}",
          file=sys.stderr, flush=True)


def remaining() -> float:
    return DEADLINE - (time.perf_counter() - _T0)


def main():
    hb("start", f"pid={os.getpid()} deadline={DEADLINE:.0f}s "
                f"det_mode={DET_MODE}")
    if CPU_MODE:
        from mmmot_tpu.utils.jax_setup import force_cpu

        force_cpu()
    else:
        # Point the persistent compile cache at a REPO-COMMITTED directory:
        # the driver's end-of-round bench runs in a fresh container where
        # ~/.cache is empty, and a cold compile of the flagship program over
        # a stalled tunnel can exceed the driver's kill (round 2's rc=124;
        # reproduced round 3 at >400 s compile).  Shipping the cache with
        # the repo turns that into a warm load.  Same image + same TPU type
        # -> same cache key; a miss just falls back to compiling.
        os.environ.setdefault(
            "MMMOT_XLA_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".xla_cache", "tpu"))
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.configs import flagship
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import (TrackingModule,
                                   track_sequences_from_frames_batched)
    from mmmot_tpu.utils.jax_setup import setup_jax

    setup_jax()
    if os.environ.get("MMMOT_BENCH_WRITE_CACHE", "") in ("", "0"):
        # Read-only compile cache by default: serializing an executable for
        # a cache WRITE is itself a tunnel RPC that can wedge for minutes
        # (measured: entry landed 6 min after the compile finished, queued
        # ahead of the next d2h).  The repo ships pre-populated entries;
        # refresh them with MMMOT_BENCH_WRITE_CACHE=1 after pipeline
        # changes.
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1e9)
    hb("jax_imported", f"devices={[str(d) for d in jax.devices()]}")

    cfg = flagship(compute_dtype="bfloat16", max_dets=N, crop=CROP,
                   point_len=P, s2d_stem=S2D_MODE)
    import dataclasses
    solver = os.environ.get("MMMOT_BENCH_SOLVER")
    assoc = cfg.assoc
    if solver:
        assoc = dataclasses.replace(assoc, solver=solver)
    if DET_MODE:
        assoc = dataclasses.replace(assoc, use_det_scores=True)
    if REVIVAL:
        assoc = dataclasses.replace(assoc, revival_window=REVIVAL)
    if GATE_MODE:
        # The quality stack's published operating point
        # (scripts/real_quality_run.py: ydet_revival_gate).
        assoc = dataclasses.replace(assoc, iou_weight=1.0, iou_gate=0.1)
    cfg = cfg.replace(assoc=assoc)
    net = model_entry(cfg.model)

    # Host-side: only the tiny arrays (boxes ~256 KB, masks ~16 KB) — the
    # frames/clouds are generated on device below, so no multi-hundred-MB
    # h2d transfer ever crosses the (stall-prone) tunnel.
    rng = np.random.default_rng(0)
    det_counts = rng.integers(3, 17, (S, T))   # KITTI val: ~3-16 cars/frame
    det_mask_h = np.arange(N)[None, None, :] < det_counts[..., None]
    cx = rng.uniform(100, W - 100, (S, T, N))
    cy = rng.uniform(100, H - 80, (S, T, N))
    bw = rng.uniform(40, 160, (S, T, N))
    bh = rng.uniform(30, 90, (S, T, N))
    boxes_h = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                       axis=-1).astype(np.float32)
    # proj stays a HOST array: it is closed over by the jitted function, and
    # closure constants that live on the device are fetched d2h at every
    # trace to be embedded as MLIR literals (minutes under a stalled
    # tunnel).  A numpy closure constant embeds for free.
    proj = np.asarray([[720.0, 0, W / 2, 40.0],
                       [0, 720.0, H / 2, 1.0],
                       [0, 0, 1, 0.003]], np.float32)

    # Compaction capacity: sized from the actual workload (known at pack
    # time for real KITTI too), rounded up to a chunk multiple.  Exact
    # sizing matters: extraction cost is linear in capacity/chunk
    # iterations (a full chunk of slack headroom measured -7% FPS), and
    # the n_dropped assert below catches any undersizing.
    chunk = CHUNK or 64
    max_valid = int(det_counts.sum(axis=1).max())
    compact = int(np.ceil(max_valid / chunk) * chunk)
    compact = int(os.environ.get("MMMOT_BENCH_COMPACT", compact))

    # Init params on a small dummy batch (shapes of crops/points only).
    dummy = {
        "crops": jnp.zeros((1, 2, 2, CROP, CROP, 3), jnp.float32),
        "points": jnp.zeros((1, 2, 2, P, 4), jnp.float32),
        "point_mask": jnp.ones((1, 2, 2, P), bool),
        "det_mask": jnp.ones((1, 2, 2), bool),
    }
    init_fn = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))
    try:
        # Init on the host CPU backend and ship the params once (~80 MB):
        # compiling the init program on the TPU side costs ~2 min of the
        # driver's kill budget when the tunnel is stalled, for throwaway
        # random values.
        with jax.default_device(jax.devices("cpu")[0]):
            variables = init_fn(jax.random.PRNGKey(0), dummy)
        variables = jax.device_put(variables, jax.devices()[0])
        jax.block_until_ready(variables)
        hb("model_init", f"params inited on cpu + shipped (compact={compact})")
    except Exception as e:  # no cpu backend alongside the TPU plugin
        hb("model_init_cpu_failed", repr(e))
        variables = init_fn(jax.random.PRNGKey(0), dummy)
        jax.block_until_ready(variables)
        hb("model_init", f"params inited on device (compact={compact})")

    variables_f = variables      # float weights, kept for the bf16 row
    if INT8_MODE:
        # The quant pytree is DETERMINISTIC here (PRNGKey(0) init weights +
        # PRNGKey(7) calibration crops), so it is persisted to a repo-
        # committed cache: re-deriving it measured ~185 s of the round-4
        # bench wall (the calibration forward compiles a throwaway VGG
        # program + dozens of small eager quantization ops, each a tunnel
        # RPC).  A load is one file read + one h2d ship.  Refresh with
        # MMMOT_BENCH_REQUANT=1 after model/quantize changes.
        from flax import serialization as _ser

        from mmmot_tpu.models.quantize import with_int8_appearance
        from mmmot_tpu.ops.crop_resize import normalize_crops

        def _canon(q):
            # Tuples -> lists, leaves -> numpy: the SAME (serializable)
            # treedef whether the pytree was computed or loaded.
            if isinstance(q, (tuple, list)):
                return [_canon(x) for x in q]
            if isinstance(q, dict):
                return {k: _canon(v) for k, v in q.items()}
            return np.asarray(q)

        qdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".bench_cache")
        qpath = os.path.join(
            qdir, f"quant_int8_crop{CROP}{'_s2d' if S2D_MODE else ''}"
                  ".msgpack")
        # MMMOT_BENCH_REQUANT=1 forces re-derivation (use after
        # model/quantize changes).  Deliberately INDEPENDENT of
        # MMMOT_BENCH_WRITE_CACHE: a program-cache refresh should load the
        # committed quant pytree — re-quantizing is dozens of eager ops,
        # each a tunnel RPC, and a wedged tunnel can stall it for the
        # whole bench deadline (measured 15+ min, twice).
        refresh = os.environ.get("MMMOT_BENCH_REQUANT", "") not in (
            "", "0")
        quant = None
        if os.path.exists(qpath) and not refresh:
            try:
                with open(qpath, "rb") as fh:
                    blob = _ser.msgpack_restore(fh.read())
                if (blob["crop"] == CROP
                        and blob["depth"] == cfg.model.appearance.depth
                        and blob.get("s2d", False) == S2D_MODE):
                    quant = blob["quant"]
                    hb("int8", f"quant pytree loaded from {qpath}")
            except Exception as e:   # corrupt/stale cache: recompute
                hb("int8_cache_failed", repr(e))
        if quant is None:
            # Calibrate on crops drawn from the same distribution THIS
            # BENCH feeds the trunk (uniform uint8 -> ImageNet
            # normalisation).  Representative for throughput only: real
            # detection crops have very different activation statistics,
            # so never reuse abs-max scales from here for accuracy claims —
            # quality runs calibrate on real crops
            # (scripts/real_quality_run.py --int8, tests likewise).
            calib = normalize_crops(jax.random.bits(
                jax.random.PRNGKey(7), (64, CROP, CROP, 3), jnp.uint8))
            quant = _canon(with_int8_appearance(
                variables, cfg.model.appearance, calib)["quant_int8"])
            hb("int8", "appearance trunk quantized "
                       "(per-channel int8 weights, calibrated activations)")
            if refresh or not os.path.exists(qpath):
                os.makedirs(qdir, exist_ok=True)
                with open(qpath, "wb") as fh:
                    fh.write(_ser.msgpack_serialize(
                        {"crop": CROP,
                         "depth": cfg.model.appearance.depth,
                         "s2d": S2D_MODE,
                         "quant": quant}))
                hb("int8_cache", f"quant pytree saved to {qpath}")
        variables = {**variables,
                     "quant_int8": jax.device_put(quant, jax.devices()[0])}
        jax.block_until_ready(variables["quant_int8"])

    # MMMOT_BENCH_PALLAS: "1" force the fused affinity kernel, "0" force
    # the XLA modules, unset = auto (kernel ON for the TPU backend).
    pal = os.environ.get("MMMOT_BENCH_PALLAS")
    module = TrackingModule(net, variables, cfg.assoc,
                            use_pallas_affinity=(None if pal is None
                                                 else pal == "1"))
    from mmmot_tpu.tracker.kitti_runner import _crop_window

    crop_window = CROP_WINDOW or _crop_window(boxes_h, det_mask_h, W)

    # On-device workload generation: KITTI-sized uint8 frames + uniform
    # clouds from jax.random — same distributions the host path used.
    @jax.jit
    def gen_workload(key):
        ki, kc = jax.random.split(key)
        images = jax.random.bits(ki, (S, T, H, W, 3), jnp.uint8)
        u = jax.random.uniform(kc, (S, T, M, 4), jnp.float32)
        lo = jnp.asarray([-25.0, -3.0, 2.0, 0.0], jnp.float32)
        hi = jnp.asarray([25.0, 3.0, 70.0, 1.0], jnp.float32)
        return images, lo + u * (hi - lo)

    images, clouds = gen_workload(jax.random.PRNGKey(42))
    boxes = jnp.asarray(boxes_h)
    det_mask = jnp.asarray(det_mask_h)
    jax.block_until_ready((images, clouds, boxes, det_mask))
    hb("workload", f"frames {images.shape} uint8 + clouds {clouds.shape} "
                   f"generated on device")

    # ``variables`` is an ARGUMENT, not a closure: a closed-over device
    # pytree (~80 MB of params) is fetched d2h at every trace to embed as
    # MLIR literals — measured 370 s of RPC wait under a stalled tunnel,
    # and it bloats the compiled program + persistent-cache entry.
    def run_fn(vars_, im, cl, bx, dm):
        mod = TrackingModule(net, vars_, cfg.assoc,
                             use_pallas_affinity=module.use_pallas_affinity)
        return track_sequences_from_frames_batched(
            mod, im, cl, bx, dm, proj, (CROP, CROP), P,
            compact_capacity=compact, extract_chunk=CHUNK,
            crop_window=crop_window)

    f = jax.jit(run_fn)

    # Multi-chip: shard the sequence axis over the mesh's data axis
    # (embarrassingly parallel; XLA partitions the whole pipeline).
    n_dev = jax.device_count()
    if n_dev > 1 and S % n_dev == 0:
        from mmmot_tpu.config import ParallelConfig
        from mmmot_tpu.parallel import make_mesh, shard_sequences

        mesh = make_mesh(ParallelConfig(num_data=n_dev))
        sharded = shard_sequences(mesh, {
            "images": images, "clouds": clouds, "boxes": boxes,
            "det_mask": det_mask})
        images, clouds = sharded["images"], sharded["clouds"]
        boxes, det_mask = sharded["boxes"], sharded["det_mask"]
        from mmmot_tpu.parallel import replicate

        variables = replicate(mesh, variables)
    else:
        n_dev = 1

    # Explicit AOT compile so trace/lower time, XLA compile time (or cache
    # load) and run time are separately attributable in the heartbeat trail.
    #
    # Trace/lower runs under default_device(cpu): tracing evaluates eager
    # jnp ops on concrete constants (iota/linspace/resize-matrix builds…),
    # and each of those is a tiny execution on the DEFAULT device — over a
    # stalled axon tunnel that measured 370 s of pure RPC wait vs 21 s with
    # the constants computed host-side.  The lowering PLATFORM is unaffected:
    # it follows the committed TPU arrays, not the default device.
    tc = time.perf_counter()
    try:
        _cpu0 = jax.devices("cpu")[0]
    except Exception:
        _cpu0 = None
    if _cpu0 is not None and not CPU_MODE:
        # Explicitly-sharded avals pin the lowering platform to the TPU
        # (concrete arrays alone do NOT under default_device — the Pallas
        # kernel would lower for CPU and fail).
        avals = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding),
            (variables, images, clouds, boxes, det_mask))
        with jax.default_device(_cpu0):
            lowered = f.lower(*avals)
    else:
        lowered = f.lower(variables, images, clouds, boxes, det_mask)
    hb("lowered", f"{time.perf_counter() - tc:.1f}s trace+lower")
    tc = time.perf_counter()
    compiled = lowered.compile()
    hb("compiled", f"{time.perf_counter() - tc:.1f}s compile/cache-load")

    run_times = []
    fetch_info: dict = {}
    secondary: dict = {}

    def emit_json(dropped) -> str:
        extra = dict(secondary)
        if run_times:
            best = min(run_times)
        else:
            # No clean timed run landed (tunnel wedge): fall back to the
            # warm-run wall INCLUDING its verification fetch — conservative
            # (it absorbs the wedge), but honest and better than nothing.
            best = fetch_info["warm_wall"]
            extra["conservative_warm_fetch_timing"] = True
        fps = (S * T) / best
        return json.dumps({
            "metric": "kitti_tracking_fps_per_chip",
            "value": round(fps / n_dev, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / n_dev / BASELINE_FPS, 3),
            "config": {"crop": CROP, "point_len": P, "S": S, "T": T, "N": N,
                       "compact": compact, "chunk": CHUNK,
                       "crop_window": crop_window, "det_mode": DET_MODE,
                       "revival_window": REVIVAL, "iou_gate": GATE_MODE,
                       "int8": INT8_MODE, "s2d": S2D_MODE,
                       "pallas_affinity": module.use_pallas_affinity,
                       "dropped_dets": dropped, "devices": n_dev,
                       "aggregate_fps": round(fps, 2),
                       "run_secs": [round(t, 3) for t in run_times],
                       "stage_secs": _STAGES, **extra},
        })

    def timed_run():
        # Timing is dispatch + block_until_ready, NO d2h: the axon tunnel's
        # d2h path wedges for 5-15 min at a time (a 64 KB ids fetch measured
        # >550 s while execution itself ran at full speed), so a fetch-based
        # timer conflates tunnel stalls with compute.  block_until_ready
        # agrees with fetch-based timing on this pipeline (323.4 vs 323.5
        # FPS, docs/PERFORMANCE.md); the warm run below still does one real
        # (bounded) fetch to verify end-to-end output delivery.
        t0 = time.perf_counter()
        out = compiled(variables, images, clouds, boxes, det_mask)
        jax.block_until_ready(out)
        return time.perf_counter() - t0, out

    # Untimed warm run first: residual tunnel-stall debt (e.g. an async
    # params/workload transfer still draining) surfaces inside the first
    # execution and would otherwise poison the recorded FPS (measured: a
    # post-stall first run at 3.28 s vs 1.26 s steady).
    _warm_t0 = time.perf_counter()
    dt, out = timed_run()
    hb("warm", f"untimed warm run: {dt:.2f}s")

    # Verification fetch in a worker thread with a bounded join (pure d2h
    # transfers are thread-safe under the tunnel; eager *compute* is not —
    # docs/PERFORMANCE.md).  If the tunnel's d2h path is wedged, we record
    # that rather than hang past the driver's kill.
    import threading

    def _fetch(o):
        fetch_info["dropped"] = int(np.asarray(o["n_dropped"]).sum())
        fetch_info["ids_ok"] = bool(np.asarray(o["ids"]).shape == (S, T, N))
        # Warm wall-clock incl. the fetch: the only honest (if very
        # conservative) timing available if no clean timed run ever lands.
        fetch_info["warm_wall"] = time.perf_counter() - _warm_t0

    fetch_thread = threading.Thread(target=_fetch, args=(out,), daemon=True)
    fetch_thread.start()
    # Wait for the fetch to DRAIN before timing anything: when the tunnel's
    # d2h path wedges (minutes at a time), subsequent *executions* queue
    # behind it too — a timed run issued mid-wedge measured 112 s for a
    # 1.24 s program.  Most wedges drain in 3-7 min; budget everything up
    # to (deadline - 120 s) for it — but always at least 45 s even under a
    # tiny MMMOT_BENCH_DEADLINE, so healthy runs still get their dropped==0
    # assertion — with heartbeats so a kill is diagnosable.
    _wait_t0 = time.perf_counter()
    while fetch_thread.is_alive() and (
            remaining() > 120.0 or time.perf_counter() - _wait_t0 < 45.0):
        fetch_thread.join(timeout=30.0)
        if fetch_thread.is_alive():
            hb("fetch_wait", f"d2h verification fetch still pending "
                             f"({remaining():.0f}s to deadline)")
    if "dropped" in fetch_info:
        assert fetch_info["dropped"] == 0, (
            f"{fetch_info['dropped']} detections dropped; raise COMPACT")
        hb("verified", f"output fetch ok (dropped=0, ids {S}x{T}x{N})")
        dropped = 0
    else:
        dropped = "fetch_stalled"
        hb("fetch_stalled", "d2h wedged past the fetch budget; timed runs "
                            "below may include tunnel-stall time")

    # Watchdog BEFORE the first timed run (the stage most likely to sit
    # behind a wedged d2h): if any stage wedges past the deadline, print
    # the best honest JSON from here and hard-exit rather than letting the
    # driver's kill record NOTHING.  Falls back to the warm-run+fetch wall
    # when no timed run landed; if even that is missing there is no honest
    # number and only heartbeats are emitted.
    def _watchdog():
        time.sleep(max(remaining(), 0.0) + 60.0)
        if run_times or "warm_wall" in fetch_info:
            hb("watchdog", "stage wedged post-measurement; emitting JSON")
            print(emit_json(fetch_info.get("dropped", "fetch_stalled")),
                  flush=True)
            os._exit(0)
        hb("watchdog", "wedged with no valid measurement; nothing to emit")
        os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    dt, _ = timed_run()
    run_times.append(dt)
    hb("run", f"1/{N_RUNS}: {dt:.2f}s ({S * T / dt:.1f} fps agg)")

    prof_dir = os.environ.get("MMMOT_BENCH_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            dt, _ = timed_run()
        hb("profiled", f"trace -> {prof_dir}")

    for i in range(1, N_RUNS):
        # Deadline guard: always leave room to print the JSON line — a
        # timed-out bench records NOTHING, which is strictly worse than
        # fewer repeats.  Short runs (< 30 s) are always allowed even past
        # the soft deadline: the deadline keeps a ~150 s margin below the
        # driver's kill, a few seconds of extra runs cannot blow it, and
        # min() over >=2 runs is what rejects a stall-poisoned sample.
        if remaining() < 1.5 * run_times[-1] + 10.0 and (
                i >= 2 or run_times[-1] > 30.0):
            hb("deadline", f"skipping runs {i + 1}..{N_RUNS} "
                           f"({remaining():.0f}s left)")
            break
        dt, _ = timed_run()
        run_times.append(dt)
        hb("run", f"{i + 1}/{N_RUNS}: {dt:.2f}s ({S * T / dt:.1f} fps agg)")

    if dropped != 0 and not fetch_thread.is_alive():
        # The stalled fetch may have drained while we timed runs.
        if "dropped" in fetch_info:
            dropped = fetch_info["dropped"]
            hb("verified", "late output fetch completed")

    # Secondary bf16 row: the default run is int8 (the sanctioned serving
    # point), but the bf16 reference-faithful number stays in the SAME
    # JSON so both design points are recorded every round.  Passing the
    # FLOAT variables to the same jitted fn compiles the bf16 graph (a
    # warm persistent-cache load) and two timed runs land bf16_fps.
    if INT8_MODE and n_dev == 1 and run_times \
            and os.environ.get("MMMOT_BENCH_BOTH", "1") not in ("", "0") \
            and remaining() > 90.0:
        try:
            tc = time.perf_counter()
            if _cpu0 is not None and not CPU_MODE:
                avals_f = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                   sharding=x.sharding),
                    (variables_f, images, clouds, boxes, det_mask))
                with jax.default_device(_cpu0):
                    compiled_f = f.lower(*avals_f).compile()
            else:
                compiled_f = f.lower(variables_f, images, clouds, boxes,
                                     det_mask).compile()
            hb("bf16_compiled", f"{time.perf_counter() - tc:.1f}s")
            bf16_times = []
            for _ in range(2):
                if remaining() < 30.0 and bf16_times:
                    break
                t0 = time.perf_counter()
                outf = compiled_f(variables_f, images, clouds, boxes,
                                  det_mask)
                jax.block_until_ready(outf)
                bf16_times.append(time.perf_counter() - t0)
            secondary["bf16_fps"] = round(S * T / min(bf16_times) / n_dev,
                                          2)
            secondary["bf16_run_secs"] = [round(t, 3) for t in bf16_times]
            hb("bf16", f"faithful bf16 point: {secondary['bf16_fps']} fps")
        except Exception as e:      # never lose the primary number
            hb("bf16_failed", repr(e))

    print(emit_json(dropped), flush=True)
    os._exit(0)  # don't let a wedged tunnel RPC hang interpreter teardown


if __name__ == "__main__":
    main()
