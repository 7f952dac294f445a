"""Online per-frame serving LATENCY benchmark (the number bench.py doesn't
measure).

``bench.py`` measures batched throughput (S=8 sequences x T=512-frame
windows).  A serving deployment of the reference-shaped tracker
(SURVEY.md §3.2 — ``TrackingModule.predict`` one frame at a time;
``cli/serve.py`` / ``mmmot-export`` here) instead calls the PER-FRAME step:
raw KITTI frame + cloud + detections in, track ids out, state carried.
This script times exactly that unit — the same ``deploy._build_step``
program ``mmmot-export`` serializes — at the reference-faithful operating
point (crop 224, P 512, N 32 slots, 384x1248 frame, 16384-point cloud).

Three numbers per weight mode (bf16 and int8 trunk), ALL fetch-timed —
``block_until_ready`` alone resolves early for some isolated executables
under the axon tunnel and once produced a sub-FLOP-floor reading here
(docs/PERFORMANCE.md "never trust a TPU timing without a fetch"):

* **sync ms/frame** (p50/p90/p99/mean): each step's ids fetched to host —
  dispatch + execute + d2h RTT, the latency a blocking remote client
  observes.  Under the tunnel the fetch RTT (~30 ms) dominates; a
  co-located host pays pipelined + ~0.1 ms.
* **pipelined ms/frame**: K steps dispatched back-to-back (each consumes
  the previous state, so the device serializes them; the host does not
  wait per step), one fetch at the end.
* **device ms/frame**: the same step chained by ``lax.scan`` inside ONE
  program (F frames per dispatch) — amortizes host dispatch away; the
  pure device rate and the deployment shape for small capacities.

Inputs are generated on device (`jax.random` inside jit) so no
multi-hundred-KB h2d crosses the stall-prone tunnel per frame; real
serving additionally pays the frame h2d (~1.4 MB uint8 — microseconds on
PCIe, and overlappable).  Frames cycle through ``F`` distinct variants;
execution results are not cached by the runtime (verified in
docs/PERFORMANCE.md), so repeated shapes are genuine compute.

Usage:  python scripts/bench_latency.py          # both modes, JSON line
Env:    MMMOT_LAT_STEPS (default 100), MMMOT_LAT_CPU=1 (debug off-TPU),
        MMMOT_LAT_INT8=0 (skip the int8 row),
        MMMOT_LAT_PROFILE=<dir> (xplane trace of the device-scan probe;
        summarize with scripts/profile_ops.py — the serving-step
        speed-of-light accounting in docs/PERFORMANCE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CPU = os.environ.get("MMMOT_LAT_CPU", "") not in ("", "0")
# CPU debug runs shrink every axis (a faithful-scale VGG16 frame takes
# minutes per step on this single-core host); the TPU path is faithful.
H, W = (96, 320) if _CPU else (384, 1248)
M = 2048 if _CPU else 16384
CROP = int(os.environ.get("MMMOT_LAT_CROP", 64 if _CPU else 224))
P = int(os.environ.get("MMMOT_LAT_P", 64 if _CPU else 512))
N = int(os.environ.get("MMMOT_LAT_N", 8 if _CPU else 32))
STEPS = int(os.environ.get("MMMOT_LAT_STEPS", 100))
# Space-to-depth stem (AppearanceConfig.s2d_stem — the TPU stem redesign).
S2D = os.environ.get("MMMOT_LAT_S2D", "") not in ("", "0")
F = 16                      # distinct generated frames, cycled
_T0 = time.perf_counter()


def hb(msg: str) -> None:
    print(f"[lat +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    if _CPU:
        from mmmot_tpu.utils.jax_setup import force_cpu
        force_cpu()
    else:
        os.environ.setdefault(
            "MMMOT_XLA_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".xla_cache", "tpu"))
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.configs import flagship
    from mmmot_tpu.deploy import (_build_step, _fresh_state, _state_to_dict)
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule
    from mmmot_tpu.utils.jax_setup import setup_jax

    setup_jax()
    hb(f"devices={[str(d) for d in jax.devices()]}")
    dev = jax.devices()[0]

    cfg = flagship(compute_dtype="bfloat16", max_dets=N, crop=CROP,
                   point_len=P, s2d_stem=S2D)
    net = model_entry(cfg.model)

    # Host-side tiny arrays only (bench.py tunnel rules): boxes + proj.
    rng = np.random.default_rng(0)
    counts = rng.integers(3, 17, (F,))
    det_mask_h = (np.arange(N)[None, :] < counts[:, None])
    cx = rng.uniform(W * 0.1, W * 0.9, (F, N))
    cy = rng.uniform(H * 0.25, H * 0.8, (F, N))
    bw = rng.uniform(W * 0.03, W * 0.12, (F, N))
    bh = rng.uniform(H * 0.08, H * 0.25, (F, N))
    boxes_h = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                       axis=-1).astype(np.float32)
    proj_h = np.asarray([[720.0, 0, W / 2, 40.0],
                         [0, 720.0, H / 2, 1.0],
                         [0, 0, 1, 0.003]], np.float32)

    dummy = {
        "crops": jnp.zeros((1, 2, 2, CROP, CROP, 3), jnp.float32),
        "points": jnp.zeros((1, 2, 2, P, 4), jnp.float32),
        "point_mask": jnp.ones((1, 2, 2, P), bool),
        "det_mask": jnp.ones((1, 2, 2), bool),
    }
    init_fn = jax.jit(lambda r, b: net.init({"params": r}, b, train=False))
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            variables = init_fn(jax.random.PRNGKey(0), dummy)
        variables = jax.device_put(variables, dev)
        jax.block_until_ready(variables)
    except Exception:
        variables = init_fn(jax.random.PRNGKey(0), dummy)
        jax.block_until_ready(variables)
    hb("params ready")

    # On-device frame/cloud generation (uint8 frames like real serving).
    @jax.jit
    def gen(key):
        ki, kc = jax.random.split(key)
        images = jax.random.bits(ki, (F, H, W, 3), jnp.uint8)
        xyz = jax.random.uniform(kc, (F, M, 3), jnp.float32,
                                 minval=-40.0, maxval=40.0)
        clouds = jnp.concatenate(
            [xyz, jnp.ones((F, M, 1), jnp.float32)], axis=-1)
        return images, clouds

    images, clouds = jax.device_put(gen(jax.random.PRNGKey(3)), dev)
    boxes = jax.device_put(jnp.asarray(boxes_h), dev)
    det_masks = jax.device_put(jnp.asarray(det_mask_h), dev)
    jax.block_until_ready((images, clouds, boxes, det_masks))
    hb("workload on device")

    step_raw = _build_step(net, cfg.assoc, (CROP, CROP), P)
    # Donating the carried state matches real serving (mmmot-serve holds
    # one live state buffer) and avoids K live copies during the
    # pipelined chain.
    step = jax.jit(step_raw, donate_argnums=(1,))

    # Device-only probe: the same step chained by lax.scan INSIDE one
    # program (F frames/call), so the per-call host dispatch (flattening
    # a several-hundred-leaf params pytree — milliseconds on a slow
    # host core) is amortized away.  Everything passed as jit ARGS
    # (closure device arrays are fetched d2h at every trace — tunnel
    # trap, docs/PERFORMANCE.md).
    def _scan_raw(vars_, state_d, ims, cls_, bxs, dms):
        def body(st, f):
            st2, ids, _ = step_raw(vars_, st, ims[f], cls_[f], bxs[f],
                                   dms[f], proj_h)
            return st2, ids
        st, ids = jax.lax.scan(body, state_d, jnp.arange(F))
        return st, ids[-1]

    scan_step = jax.jit(_scan_raw, donate_argnums=(1,))

    module = TrackingModule(net, variables, cfg.assoc)

    def run_mode(vars_, tag):
        state = _state_to_dict(_fresh_state(module, N))
        state = jax.device_put(state, dev)
        t0 = time.perf_counter()
        state, ids, _ = step(vars_, state, images[0], clouds[0], boxes[0],
                             det_masks[0], proj_h)
        jax.block_until_ready(ids)
        hb(f"{tag}: compiled+first step {time.perf_counter() - t0:.1f}s")

        # Sync latency: HOST-FETCH every step's ids.  block_until_ready
        # resolves EARLY for some isolated executables under the axon
        # tunnel (docs/PERFORMANCE.md "never trust a TPU timing without a
        # fetch" — a first cut of this script timed the bf16 step at
        # 1.37 ms, below the 2.5 ms MXU-peak FLOP floor of 32 VGG16
        # crops: impossible, hence fetch).  The (N,) int32 fetch itself
        # is one small d2h RPC — part of what a real server pays to act
        # on the ids.
        lat = []
        for k in range(STEPS):
            f = (k + 1) % F
            t0 = time.perf_counter()
            state, ids, _ = step(vars_, state, images[f], clouds[f],
                                 boxes[f], det_masks[f], proj_h)
            np.asarray(ids)
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.asarray(lat)

        # Pipelined: dispatch the whole chain, fetch once at the end.
        outs = []
        t0 = time.perf_counter()
        for k in range(STEPS):
            f = k % F
            state, ids, _ = step(vars_, state, images[f], clouds[f],
                                 boxes[f], det_masks[f], proj_h)
            outs.append(ids)
        np.asarray(outs[-1])
        piped = (time.perf_counter() - t0) * 1e3 / STEPS

        # Device-only rate via the in-graph scan chain (one dispatch per
        # F frames).  Same per-frame math; isolates device time from
        # host dispatch.
        state = jax.device_put(_state_to_dict(_fresh_state(module, N)), dev)
        state, ids = scan_step(vars_, state, images, clouds, boxes,
                               det_masks)
        np.asarray(ids)                                    # compile
        prof_dir = os.environ.get("MMMOT_LAT_PROFILE")
        if prof_dir:
            # One traced F-frame round per mode: the xplane per-op table
            # is the serving-step accounting (scripts/profile_ops.py).
            from mmmot_tpu.utils.profiling import trace
            with trace(os.path.join(prof_dir, tag)):
                state, ids = scan_step(vars_, state, images, clouds,
                                       boxes, det_masks)
                np.asarray(ids)
            hb(f"{tag}: xplane trace -> {prof_dir}/{tag}")
        rounds = max(1, STEPS // F)
        t0 = time.perf_counter()
        for _ in range(rounds):
            state, ids = scan_step(vars_, state, images, clouds, boxes,
                                   det_masks)
        np.asarray(ids)
        dev_ms = (time.perf_counter() - t0) * 1e3 / (rounds * F)

        row = {
            "sync_ms_p50": round(float(np.percentile(lat, 50)), 3),
            "sync_ms_p90": round(float(np.percentile(lat, 90)), 3),
            "sync_ms_p99": round(float(np.percentile(lat, 99)), 3),
            "sync_ms_mean": round(float(lat.mean()), 3),
            "pipelined_ms": round(piped, 3),
            "pipelined_fps": round(1e3 / piped, 1),
            "device_ms": round(dev_ms, 3),
            "device_fps": round(1e3 / dev_ms, 1),
        }
        hb(f"{tag}: sync p50 {row['sync_ms_p50']} ms, "
           f"pipelined {row['pipelined_ms']} ms, "
           f"device {row['device_ms']} ms/frame")
        return row

    result = {
        "metric": "serve_step_latency",
        "unit": "ms/frame",
        "config": {"crop": CROP, "point_len": P, "N": N, "frame": [H, W],
                   "cloud_points": M, "steps": STEPS, "s2d_stem": S2D,
                   "backend": jax.default_backend()},
        "bf16": run_mode(variables, "bf16"),
    }

    if os.environ.get("MMMOT_LAT_INT8", "1") not in ("", "0"):
        from mmmot_tpu.models.quantize import with_int8_appearance
        from mmmot_tpu.ops.crop_resize import normalize_crops

        # Noise calibration — representative for THROUGHPUT/latency only
        # (bench.py carries the same caveat); quality runs calibrate on
        # real crops.
        calib = normalize_crops(jax.random.bits(
            jax.random.PRNGKey(7), (64, CROP, CROP, 3), jnp.uint8))
        vars_q = with_int8_appearance(variables, cfg.model.appearance, calib)
        jax.block_until_ready(vars_q)
        result["int8"] = run_mode(vars_q, "int8")

    print(json.dumps(result), flush=True)
    # Record the artifact only for real-chip runs (CPU smoke/test runs are
    # debug-scale and must not clobber the published numbers); override
    # the destination with MMMOT_LAT_OUT.
    out = os.environ.get("MMMOT_LAT_OUT")
    if out is None and not _CPU:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results",
            "latency_s2d.json" if S2D else "latency.json")
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
