"""Multi-stream serving latency/throughput: S concurrent camera streams
micro-batched into ONE vmapped per-frame step (cli/serve.py --streams,
deploy.py _build_multistream_step).

The round-4 latency study showed batched windows are ~3x cheaper per frame
than single-frame steps (2.2 vs 6.5 ms/frame-chip int8) but shipped no way
for several live streams to realize that rate — this measures the missing
product piece.  For each S in {1, 2, 4, 8}: the full-batch step (all S
streams active) is fetch-timed per dispatch, giving

* **batch ms**  (p50/p99): wall per flush — what every stream's frame
  waits once the batch is full (the per-frame latency floor a client sees
  on top of its own --flush-ms wait);
* **ms/frame-chip** = batch_ms / S: the serving throughput unit to compare
  against the single-stream step (S=1 row) and bench.py's batched windows;
* **device ms/frame**: lax.scan chain of the same step (dispatch
  amortized) — the pure device rate.

Same tunnel rules as scripts/bench_latency.py: on-device workload
generation, fetch-verified timing, everything a jit ARGUMENT.

Usage:  python scripts/bench_multistream.py            # JSON line + file
Env:    MMMOT_MS_STEPS (default 60), MMMOT_MS_CPU=1, MMMOT_MS_INT8=0,
        MMMOT_MS_SIZES (default "1,2,4,8"), MMMOT_MS_OUT (artifact path)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

_CPU = os.environ.get("MMMOT_MS_CPU", "") not in ("", "0")
H, W = (96, 320) if _CPU else (384, 1248)
M = 2048 if _CPU else 16384
CROP = int(os.environ.get("MMMOT_MS_CROP", 64 if _CPU else 224))
P = int(os.environ.get("MMMOT_MS_P", 64 if _CPU else 512))
N = int(os.environ.get("MMMOT_MS_N", 8 if _CPU else 32))
STEPS = int(os.environ.get("MMMOT_MS_STEPS", 60))
SIZES = tuple(int(s) for s in os.environ.get(
    "MMMOT_MS_SIZES", "1,2,4,8").split(","))
F = 8                       # distinct generated frame variants, cycled
_T0 = time.perf_counter()


def hb(msg: str) -> None:
    print(f"[ms +{time.perf_counter() - _T0:6.1f}s] {msg}",
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
    from mmmot_tpu.deploy import (_build_multistream_step, _fresh_state,
                                  _state_to_dict)
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule
    from mmmot_tpu.utils.jax_setup import setup_jax

    setup_jax()
    hb(f"devices={[str(d) for d in jax.devices()]}")
    dev = jax.devices()[0]

    cfg = flagship(compute_dtype="bfloat16", max_dets=N, crop=CROP,
                   point_len=P)
    net = model_entry(cfg.model)

    rng = np.random.default_rng(0)
    counts = rng.integers(3, 17, (F, max(SIZES)))
    det_mask_h = (np.arange(N)[None, None, :] < counts[..., None])
    cx = rng.uniform(W * 0.1, W * 0.9, (F, max(SIZES), N))
    cy = rng.uniform(H * 0.25, H * 0.8, (F, max(SIZES), N))
    bw = rng.uniform(W * 0.03, W * 0.12, (F, max(SIZES), N))
    bh = rng.uniform(H * 0.08, H * 0.25, (F, max(SIZES), N))
    boxes_h = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                        cy + bh / 2], axis=-1).astype(np.float32)
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

    module = TrackingModule(net, variables, cfg.assoc)

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def gen(key, s):
        ki, kc = jax.random.split(key)
        images = jax.random.bits(ki, (F, s, H, W, 3), jnp.uint8)
        xyz = jax.random.uniform(kc, (F, s, M, 3), jnp.float32,
                                 minval=-40.0, maxval=40.0)
        clouds = jnp.concatenate(
            [xyz, jnp.ones((F, s, M, 1), jnp.float32)], axis=-1)
        return images, clouds

    def run_size(vars_, S, tag, compact=None):
        multi_raw = _build_multistream_step(net, cfg.assoc, (CROP, CROP),
                                            P, compact_capacity=compact)
        multi = jax.jit(multi_raw, donate_argnums=(1,))
        images, clouds = jax.device_put(
            gen(jax.random.PRNGKey(3), S), dev)
        boxes = jax.device_put(jnp.asarray(boxes_h[:, :S]), dev)
        det_masks = jax.device_put(jnp.asarray(det_mask_h[:, :S]), dev)
        projs = jax.device_put(
            jnp.broadcast_to(jnp.asarray(proj_h)[None], (S, 3, 4)), dev)
        active = jax.device_put(jnp.ones((S,), bool), dev)
        jax.block_until_ready((images, clouds, boxes, det_masks, projs))

        one0 = _state_to_dict(_fresh_state(module, N))
        states = jax.device_put(
            jax.tree.map(lambda x: jnp.stack([x] * S), one0), dev)
        t0 = time.perf_counter()
        states, ids, _ = multi(vars_, states, active, images[0],
                               clouds[0], boxes[0], det_masks[0], projs)
        np.asarray(ids)
        hb(f"{tag} S={S}: compiled+first {time.perf_counter() - t0:.1f}s")

        lat = []
        for k in range(STEPS):
            f = (k + 1) % F
            t0 = time.perf_counter()
            states, ids, _ = multi(vars_, states, active, images[f],
                                   clouds[f], boxes[f], det_masks[f],
                                   projs)
            np.asarray(ids)        # fetch-verified (tunnel rule)
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.asarray(lat)

        # Device-only probe: scan-chain the batch step over the F variants.
        def _scan_raw(v, st, ims, cls_, bxs, dms, prj, act):
            def body(s, f):
                s2, ids, _ = multi_raw(v, s, act, ims[f], cls_[f], bxs[f],
                                       dms[f], prj)
                return s2, ids
            s, ids = jax.lax.scan(body, st, jnp.arange(F))
            return s, ids[-1]

        scan_step = jax.jit(_scan_raw, donate_argnums=(1,))
        states = jax.device_put(
            jax.tree.map(lambda x: jnp.stack([x] * S), one0), dev)
        states, ids = scan_step(vars_, states, images, clouds, boxes,
                                det_masks, projs, active)
        np.asarray(ids)
        rounds = max(1, STEPS // F)
        t0 = time.perf_counter()
        for _ in range(rounds):
            states, ids = scan_step(vars_, states, images, clouds, boxes,
                                    det_masks, projs, active)
        np.asarray(ids)
        dev_ms = (time.perf_counter() - t0) * 1e3 / (rounds * F * S)

        row = {
            "batch_ms_p50": round(float(np.percentile(lat, 50)), 3),
            "batch_ms_p99": round(float(np.percentile(lat, 99)), 3),
            "ms_per_frame_sync": round(
                float(np.percentile(lat, 50)) / S, 3),
            "device_ms_per_frame": round(dev_ms, 3),
            "device_fps_aggregate": round(1e3 / dev_ms, 1),
        }
        if compact is not None:
            row["compact_capacity"] = compact
        hb(f"{tag} S={S}: batch p50 {row['batch_ms_p50']} ms "
           f"({row['ms_per_frame_sync']} ms/frame sync, "
           f"{row['device_ms_per_frame']} ms/frame device)")
        return row

    result = {
        "metric": "multistream_serve_latency",
        "unit": "ms/frame",
        "config": {"crop": CROP, "point_len": P, "N": N, "frame": [H, W],
                   "cloud_points": M, "steps": STEPS, "sizes": list(SIZES),
                   "flush_note": "a frame additionally waits up to the "
                                 "server's --flush-ms budget (default "
                                 "6 ms) for the batch to fill",
                   "backend": jax.default_backend()},
        "bf16": {str(S): run_size(variables, S, "bf16") for S in SIZES},
    }

    # Compact-first rows: the workload's per-stream detection count is
    # 3..16, so capacity 16*S (MMMOT_MS_COMPACT_PER_S, 0 = skip) is
    # provably lossless here — in deployment size it at S x the p99
    # per-stream count (overflow detections drop, ids -1).
    cper = int(os.environ.get("MMMOT_MS_COMPACT_PER_S", 16))
    if cper:
        result["config"]["compact_per_stream"] = cper
        result["bf16_compact"] = {
            str(S): run_size(variables, S, f"bf16/c{cper * S}",
                             compact=cper * S) for S in SIZES}

    if os.environ.get("MMMOT_MS_INT8", "1") not in ("", "0"):
        from mmmot_tpu.models.quantize import with_int8_appearance
        from mmmot_tpu.ops.crop_resize import normalize_crops

        # Noise calibration — throughput/latency-representative only.
        calib = normalize_crops(jax.random.bits(
            jax.random.PRNGKey(7), (64, CROP, CROP, 3), jnp.uint8))
        vars_q = with_int8_appearance(variables, cfg.model.appearance,
                                      calib)
        jax.block_until_ready(vars_q)
        result["int8"] = {str(S): run_size(vars_q, S, "int8")
                          for S in SIZES}
        if cper:
            result["int8_compact"] = {
                str(S): run_size(vars_q, S, f"int8/c{cper * S}",
                                 compact=cper * S) for S in SIZES}

    print(json.dumps(result), flush=True)
    out = os.environ.get("MMMOT_MS_OUT")
    if out is None and not _CPU:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results",
            "latency_multistream.json")
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
