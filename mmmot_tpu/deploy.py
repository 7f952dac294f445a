"""AOT deployment artifacts: the serving step as a serialized StableHLO
program (``jax.export``).

The reference's deployment story is "ship the Python tree + a ``.pth.tar``
checkpoint" (SURVEY §5.4 — utils/train_util.py save_checkpoint/load_state);
serving then re-runs the whole PyTorch stack.  The TPU-native equivalent is
an **ahead-of-time exported program**: the complete per-frame serving step —
on-device crop resize + frustum sampling, VGG/PointNet feature extraction,
fusion, affinity + new/end heads, the in-graph LP association and ID
assignment — is traced ONCE, lowered to StableHLO for the target platforms,
and written to disk next to its weights.  A serving process (or a C++ XLA
runtime) can then run the tracker without the model zoo, flax, or any of
this package's model code: load, feed arrays, read track IDs.

Artifact layout (one directory; ``manifest.json``'s ``kind`` is
``serve_step`` for the per-frame program or ``window`` for the W-frame
streaming program from :func:`export_window_step`):

    serve_step.stablehlo   jax.export serialization of the step program
    weights.npz            model variables, one entry per pytree path
    state0.npz             zero TrackerState matching the program's carry
    manifest.json          shapes/dtypes/platforms/config provenance

The step program signature (all shapes static, from the manifest):

    (weights, state, image [H,W,3] uint8, cloud [M,4] f32,
     boxes [N,4] f32, det_mask [N] bool, proj [3,4] f32)
        -> (state', ids [N] i32, det_score [N] f32)

Weights ride as ARGUMENTS, not baked constants: embedding ~10^7 parameters
as MLIR literals bloats the artifact and re-traces fetch them device→host
(the repo-wide lesson from bench.py/serve.py — docs/PERFORMANCE.md).
State is a plain dict-of-arrays pytree (the TrackerState NamedTuple is
rebuilt inside the program), so deserialization never needs this package's
classes to reconstruct the calling convention.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

__all__ = ["export_serve_step", "export_window_step",
           "export_multistream_step", "save_artifact",
           "DeployedTracker", "ARTIFACT_PROGRAM", "ARTIFACT_WEIGHTS",
           "ARTIFACT_STATE0", "ARTIFACT_MANIFEST"]

ARTIFACT_PROGRAM = "serve_step.stablehlo"
ARTIFACT_WEIGHTS = "weights.npz"
ARTIFACT_STATE0 = "state0.npz"
ARTIFACT_MANIFEST = "manifest.json"

_SEP = "//"  # pytree-path separator inside npz keys (flax uses plain '/')


def _pallas_ok(model_cfg) -> bool:
    from mmmot_tpu.kernels import pallas_supported

    return pallas_supported(model_cfg)


def _flatten_to_npz(tree) -> Dict[str, Any]:
    """Flatten a nested-dict pytree to {path: array} with _SEP-joined keys."""
    import jax
    import numpy as np

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_path_name(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_name(entry) -> str:
    import jax

    if isinstance(entry, jax.tree_util.DictKey):
        return str(entry.key)
    if isinstance(entry, jax.tree_util.GetAttrKey):
        return entry.name
    if isinstance(entry, jax.tree_util.SequenceKey):
        return str(entry.idx)
    return str(entry)


def _skeleton(tree) -> Any:
    """JSON-able structure record for a nested pytree: dicts stay dicts,
    tuples/lists become tagged nodes (JSON has no tuple, and the exported
    call's pytree structure must match EXACTLY — the int8 quant pytree
    carries a tuple of per-layer dicts), leaves become their dtype name.

    Two things npz keys alone cannot represent: EMPTY subtrees (e.g.
    ``batch_stats`` of a BN-free model flattens to zero entries and would
    silently vanish, breaking the exported call's pytree structure) and
    extension dtypes (the .npy format round-trips bfloat16 as an opaque
    2-byte void) — the manifest carries this skeleton so loading rebuilds
    the exact structure and dtypes."""
    import numpy as np

    if isinstance(tree, dict):
        return {k: _skeleton(v) for k, v in tree.items()}
    if isinstance(tree, tuple):
        return {"__tuple__": [_skeleton(v) for v in tree]}
    if isinstance(tree, list):
        return {"__list__": [_skeleton(v) for v in tree]}
    return str(np.asarray(tree).dtype)


def _fill_from_npz(skel, npz, prefix=()) -> Any:
    """Rebuild the nested pytree described by ``skel`` from npz entries."""
    import numpy as np

    if isinstance(skel, dict):
        if "__tuple__" in skel:
            return tuple(_fill_from_npz(v, npz, prefix + (str(i),))
                         for i, v in enumerate(skel["__tuple__"]))
        if "__list__" in skel:
            return [_fill_from_npz(v, npz, prefix + (str(i),))
                    for i, v in enumerate(skel["__list__"])]
        return {k: _fill_from_npz(v, npz, prefix + (k,))
                for k, v in skel.items()}
    arr = npz[_SEP.join(prefix)]
    dt = np.dtype(skel)   # extension names (bfloat16) registered by jax
    return arr if arr.dtype == dt else arr.view(dt)


def _state_to_dict(state) -> Dict[str, Any]:
    if isinstance(state, dict):      # already a dict pytree (multistream)
        return state
    d = {"feats": dict(state.feats), "mask": state.mask, "ids": state.ids,
         "ages": state.ages, "next_id": state.next_id}
    if state.missed is not None:
        d["missed"] = state.missed
    return d


def _state_from_dict(d):
    from mmmot_tpu.tracker.tracker import TrackerState

    return TrackerState(feats=dict(d["feats"]), mask=d["mask"],
                        ids=d["ids"], ages=d["ages"], next_id=d["next_id"],
                        missed=d.get("missed"))


def _build_step(net, assoc_cfg, crop: Tuple[int, int], point_len: int,
                use_pallas: Optional[bool] = None):
    """The per-frame serving step (same math as cli/serve.py's step_fn),
    with dict-pytree state I/O so the exported calling convention is
    framework-agnostic."""
    import jax.numpy as jnp

    from mmmot_tpu.ops.crop_resize import (crop_and_resize_batched,
                                           normalize_crops)
    from mmmot_tpu.ops.frustum import frustum_sample_batched
    from mmmot_tpu.tracker import TrackingModule

    def step(weights, state_d, image, cloud, boxes, det_mask, proj):
        mod = TrackingModule(net, weights, assoc_cfg,
                             use_pallas_affinity=use_pallas)
        crops = crop_and_resize_batched(
            image.astype(jnp.float32)[None], boxes[None], crop,
            det_mask[None], method="mxu")[0]
        crops = normalize_crops(crops, scale=1.0 / 255.0)
        pts, pmask = frustum_sample_batched(
            cloud[None], boxes[None], proj, point_len,
            det_mask=det_mask[None])
        feats = mod.extract(crops, pts[0], pmask[0], det_mask)
        if mod.carry_boxes:   # gate / coverage / motion affinity read them
            feats["box"] = boxes.astype(jnp.float32)
        new_state, out = mod.step_from_feats(_state_from_dict(state_d),
                                             feats, det_mask)
        return _state_to_dict(new_state), out["ids"], out["det_score"]

    return step


def _build_multistream_step(net, assoc_cfg, crop: Tuple[int, int],
                            point_len: int,
                            use_pallas: Optional[bool] = None,
                            compact_capacity: Optional[int] = None):
    """Vmapped MULTI-STREAM serving step: S concurrent streams' frames in
    ONE program (SURVEY §5.7; the round-4 latency study's missing product
    piece — batched windows are ~3x cheaper per frame than single-stream
    steps, and this is how several cameras realize that rate).

    Signature (S = leading axis of every per-stream operand):

        (weights, states, active [S] bool, images [S,H,W,3], clouds
         [S,M,4], boxes [S,N,4], det_mask [S,N], projs [S,3,4])
            -> (states', ids [S,N] i32, det_score [S,N] f32)

    ``active[s]`` False carries stream s's state through UNCHANGED (its
    lane computes on placeholder arrays and is discarded, which is what
    buys the one-program batching) and returns ids -1 — so a flush with
    only k < S pending frames still advances exactly those k streams,
    identical to k separate per-frame steps (tested).

    ``compact_capacity`` (round 5): the padded step extracts features for
    all S·N slots while real frames average ~10 valid detections of N=32
    — the trunk is 77% of the step, so that padding is most of the bill.
    With a capacity C, the valid (stream, slot) pairs are gathered
    valid-first into C compact rows (the windows pipeline's
    compact-first machinery, tracker/sequence.py::_compact_extract), the
    trunk runs on C crops instead of S·N, and features scatter back.
    Per-stream counts vary but their SUM across streams concentrates, so
    C well under S·N is safe — size it at S times the expected p99
    per-stream count.  If more than C slots are valid the overflow
    detections are DROPPED (their ids return -1, exactly like padding) —
    valid-first order keeps earlier streams'/slots' detections.  Cheap
    full-grid work (crop-resize ~0.14 ms, frustum ~0.29 ms per frame)
    stays padded; only the trunk compacts.
    """
    import jax
    import jax.numpy as jnp

    step = _build_step(net, assoc_cfg, crop, point_len,
                       use_pallas=use_pallas)

    if compact_capacity is not None:
        return _build_multistream_step_compact(
            net, assoc_cfg, crop, point_len, int(compact_capacity),
            use_pallas=use_pallas)

    def multi(weights, states_d, active, images, clouds, boxes, det_masks,
              projs):
        new_states, ids, scores = jax.vmap(
            step, in_axes=(None, 0, 0, 0, 0, 0, 0))(
            weights, states_d, images, clouds, boxes, det_masks, projs)

        def sel(n, o):
            a = active.reshape(active.shape + (1,) * (n.ndim - 1))
            return jnp.where(a, n, o)

        states2 = jax.tree.map(sel, new_states, states_d)
        ids = jnp.where(active[:, None], ids, -1)
        scores = scores * active[:, None].astype(scores.dtype)
        return states2, ids, scores

    return multi


def _build_multistream_step_compact(net, assoc_cfg, crop: Tuple[int, int],
                                    point_len: int, capacity: int,
                                    use_pallas: Optional[bool] = None):
    """Compact-first variant of :func:`_build_multistream_step` (same
    signature/semantics; see its docstring for the capacity contract)."""
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.ops.crop_resize import (crop_and_resize_batched,
                                           normalize_crops)
    from mmmot_tpu.ops.frustum import frustum_sample_batched
    from mmmot_tpu.tracker import TrackingModule
    from mmmot_tpu.tracker.sequence import _compact_extract

    def multi(weights, states_d, active, images, clouds, boxes, det_masks,
              projs):
        mod = TrackingModule(net, weights, assoc_cfg,
                             use_pallas_affinity=use_pallas)
        # Inactive lanes must not consume compact capacity.
        live = det_masks & active[:, None]
        crops = crop_and_resize_batched(
            images.astype(jnp.float32), boxes, crop, live, method="mxu")
        crops = normalize_crops(crops, scale=1.0 / 255.0)
        pts, pmask = frustum_sample_batched(
            clouds, boxes, projs, point_len, det_mask=live)
        feats, kept = _compact_extract(mod, crops, pts, pmask, live,
                                       capacity=capacity)
        if mod.carry_boxes:   # gate / coverage / motion affinity read them
            feats["box"] = boxes.astype(jnp.float32)

        def one(state_d, f, m):
            ns, out = mod.step_from_feats(_state_from_dict(state_d), f, m)
            return _state_to_dict(ns), out["ids"], out["det_score"]

        new_states, ids, scores = jax.vmap(one)(states_d, feats, kept)

        def sel(n, o):
            a = active.reshape(active.shape + (1,) * (n.ndim - 1))
            return jnp.where(a, n, o)

        states2 = jax.tree.map(sel, new_states, states_d)
        ids = jnp.where(active[:, None], ids, -1)
        scores = scores * active[:, None].astype(scores.dtype)
        return states2, ids, scores

    return multi


def export_multistream_step(cfg, variables, streams: int,
                            image_hw: Tuple[int, int], cloud_points: int,
                            platforms: Tuple[str, ...] = ("cpu", "tpu"),
                            compact_capacity: Optional[int] = None):
    """AOT-export the multi-stream step (see _build_multistream_step).

    Returns ``(jax.export.Exported, stacked state0)``; manifest kind is
    ``multistream_step`` with ``streams`` / ``compact_capacity``
    fields."""
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule

    net = model_entry(cfg.model)
    use_pallas = tuple(platforms) == ("tpu",) and _pallas_ok(cfg.model)
    module = TrackingModule(net, variables, cfg.assoc,
                            use_pallas_affinity=use_pallas)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)
    H, W = image_hw
    S = int(streams)
    multi = _build_multistream_step(net, cfg.assoc, crop, P,
                                    use_pallas=use_pallas,
                                    compact_capacity=compact_capacity)
    one0 = _state_to_dict(_fresh_state(module, N))
    state0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (S,) + jnp.shape(x)), one0)
    aval = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype)  # noqa: E731
    in_avals = (
        jax.tree.map(aval, variables),
        jax.tree.map(aval, state0),
        jax.ShapeDtypeStruct((S,), jnp.bool_),
        jax.ShapeDtypeStruct((S, H, W, 3), jnp.uint8),
        jax.ShapeDtypeStruct((S, cloud_points, 4), jnp.float32),
        jax.ShapeDtypeStruct((S, N, 4), jnp.float32),
        jax.ShapeDtypeStruct((S, N), jnp.bool_),
        jax.ShapeDtypeStruct((S, 3, 4), jnp.float32),
    )
    exported = jax.export.export(jax.jit(multi),
                                 platforms=list(platforms))(*in_avals)
    return exported, state0


def _fresh_state(module, N: int):
    """Zero TrackerState with feats cast to the module's compute dtype
    (box coordinates stay f32 — see tracker.init_state)."""
    import jax.numpy as jnp

    ts = module.init_state(N)
    cdt = (jnp.bfloat16
           if module.net.cfg.compute_dtype == "bfloat16" else jnp.float32)
    return ts._replace(
        feats={k: (v if k == "box" else v.astype(cdt))
               for k, v in ts.feats.items()})


def export_serve_step(cfg, variables, image_hw: Tuple[int, int],
                      cloud_points: int,
                      platforms: Tuple[str, ...] = ("cpu", "tpu")):
    """Trace + lower the serving step for ``platforms`` (no device of the
    target platform required — that is the point of AOT export).

    The fused Pallas affinity kernel only lowers for the TPU platform, so
    it is enabled exactly when ``platforms == ("tpu",)`` (and covered by
    the config); multi-platform artifacts use the XLA affinity modules
    (identical results — tested in test_pallas_kernel.py).

    Returns ``(jax.export.Exported, state0)``.
    """
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule

    net = model_entry(cfg.model)
    use_pallas = tuple(platforms) == ("tpu",) and _pallas_ok(cfg.model)
    module = TrackingModule(net, variables, cfg.assoc,
                            use_pallas_affinity=use_pallas)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)
    H, W = image_hw
    step = _build_step(net, cfg.assoc, crop, P, use_pallas=use_pallas)

    state0 = _fresh_state(module, N)
    aval = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype)  # noqa: E731
    in_avals = (
        jax.tree.map(aval, variables),
        jax.tree.map(aval, _state_to_dict(state0)),
        jax.ShapeDtypeStruct((H, W, 3), jnp.uint8),
        jax.ShapeDtypeStruct((cloud_points, 4), jnp.float32),
        jax.ShapeDtypeStruct((N, 4), jnp.float32),
        jax.ShapeDtypeStruct((N,), jnp.bool_),
        jax.ShapeDtypeStruct((3, 4), jnp.float32),
    )
    exported = jax.export.export(jax.jit(step), platforms=list(platforms))(
        *in_avals)
    return exported, state0


def export_window_step(cfg, variables, window: int,
                       image_hw: Tuple[int, int], cloud_points: int,
                       capacity: Optional[int] = None,
                       crop_window: int = 512, chunk: int = 32,
                       platforms: Tuple[str, ...] = ("cpu", "tpu")):
    """AOT-export the WINDOW program: one call tracks ``window`` frames of
    raw inputs through the full compact-first streaming pipeline
    (tracker/sequence.py::track_sequence_from_frames) and returns per-frame
    ids/det scores plus the carried TrackerState — chain calls to stream
    sequences of any length, exactly like tracker/kitti_runner.py does
    live.  Signature (static shapes; W = window):

        (weights, state, images [W,H,Wd,3] u8, clouds [W,M,4] f32,
         cloud_valid [W,M] bool, boxes [W,N,4] f32, det_mask [W,N] bool,
         proj [3,4] f32)  ->  (state', ids [W,N] i32, det_score [W,N] f32)

    Same Pallas-kernel rule as :func:`export_serve_step` (tpu-only exports
    bake the fused kernel).  ``capacity`` bounds the compact-first
    extraction (default: every slot, ``window * max_dets``)."""
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule
    from mmmot_tpu.tracker.sequence import track_sequence_from_frames

    net = model_entry(cfg.model)
    use_pallas = tuple(platforms) == ("tpu",) and _pallas_ok(cfg.model)
    module = TrackingModule(net, variables, cfg.assoc,
                            use_pallas_affinity=use_pallas)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = tuple(cfg.data.crop_size)
    H, W = image_hw
    capacity = capacity if capacity is not None else window * N

    def win(weights, state_d, images, clouds, cloud_valid, boxes,
            det_mask, proj):
        mod = TrackingModule(net, weights, cfg.assoc,
                             use_pallas_affinity=use_pallas)
        out, final = track_sequence_from_frames(
            mod, images, clouds, boxes, det_mask, proj, crop, P,
            cloud_valid=cloud_valid, compact_capacity=capacity,
            extract_chunk=chunk, state0=_state_from_dict(state_d),
            return_state=True, crop_window=crop_window,
            point_source=cfg.data.point_source)
        return _state_to_dict(final), out["ids"], out["det_score"]

    state0 = _fresh_state(module, N)
    aval = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype)  # noqa: E731
    in_avals = (
        jax.tree.map(aval, variables),
        jax.tree.map(aval, _state_to_dict(state0)),
        jax.ShapeDtypeStruct((window, H, W, 3), jnp.uint8),
        jax.ShapeDtypeStruct((window, cloud_points, 4), jnp.float32),
        jax.ShapeDtypeStruct((window, cloud_points), jnp.bool_),
        jax.ShapeDtypeStruct((window, N, 4), jnp.float32),
        jax.ShapeDtypeStruct((window, N), jnp.bool_),
        jax.ShapeDtypeStruct((3, 4), jnp.float32),
    )
    exported = jax.export.export(jax.jit(win), platforms=list(platforms))(
        *in_avals)
    return exported, state0


def save_artifact(out_dir: str, exported, variables, state0, cfg,
                  image_hw: Tuple[int, int], cloud_points: int,
                  kind: str = "serve_step",
                  extra: Optional[Dict] = None) -> None:
    """Write the four-file artifact directory (see module docstring)."""
    import importlib.metadata

    import jax
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_PROGRAM), "wb") as fh:
        fh.write(exported.serialize())
    np.savez(os.path.join(out_dir, ARTIFACT_WEIGHTS),
             **_flatten_to_npz(variables))
    np.savez(os.path.join(out_dir, ARTIFACT_STATE0),
             **_flatten_to_npz(_state_to_dict(state0)))
    try:
        pkg_version = importlib.metadata.version("mmmot-tpu")
    except importlib.metadata.PackageNotFoundError:
        pkg_version = "source"
    manifest = {
        "format": 1,
        "kind": kind,
        "program": ARTIFACT_PROGRAM,
        "weights": ARTIFACT_WEIGHTS,
        "state0": ARTIFACT_STATE0,
        "weights_structure": _skeleton(variables),
        "state0_structure": _skeleton(_state_to_dict(state0)),
        "platforms": list(exported.platforms),
        "config": cfg.name,
        "image_hw": list(image_hw),
        "cloud_points": int(cloud_points),
        "max_dets": int(cfg.data.max_dets),
        "point_len": int(cfg.data.point_len),
        "crop_size": list(cfg.data.crop_size),
        "jax_version": jax.__version__,
        "mmmot_tpu_version": pkg_version,
        # mirrors the exporters' kernel-selection rule
        "pallas_affinity": bool(tuple(exported.platforms) == ("tpu",)
                                and _pallas_ok(cfg.model)),
    }
    if extra:
        manifest.update(extra)
    with open(os.path.join(out_dir, ARTIFACT_MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=2)


class DeployedTracker:
    """Run an exported artifact — no model code, flax, or config needed.

    >>> trk = DeployedTracker.load("artifact_dir/")
    >>> ids = trk.step(image, cloud, boxes, proj)   # per frame, in order
    >>> trk.reset()                                 # drop all tracks
    """

    def __init__(self, exported, weights, state0, manifest: Dict):
        import jax

        self.manifest = manifest
        # Ship weights/state once at load: numpy pytrees passed to a jitted
        # call re-transfer host->device on EVERY step (~tens of MB/frame
        # for the flagship VGG trunk).
        self._weights = jax.device_put(weights)
        self._state0 = jax.device_put(state0)
        self._state = self._state0
        # jit the exported call so repeat dispatch is cached; the inner
        # program is NOT retraced or recompiled from Python — the StableHLO
        # bytes are the program.
        self._call = jax.jit(exported.call)
        self.frame_idx = 0

    @classmethod
    def load(cls, path: str) -> "DeployedTracker":
        import jax
        import numpy as np

        with open(os.path.join(path, ARTIFACT_MANIFEST)) as fh:
            manifest = json.load(fh)
        kind = manifest.get("kind", "serve_step")
        if kind != "serve_step":
            raise ValueError(
                f"DeployedTracker serves per-frame 'serve_step' artifacts; "
                f"{path!r} is kind {kind!r} (drive a window artifact via "
                f"jax.export.deserialize + .call, shapes in its manifest)")
        with open(os.path.join(path, manifest["program"]), "rb") as fh:
            exported = jax.export.deserialize(bytearray(fh.read()))
        weights = _fill_from_npz(
            manifest["weights_structure"],
            np.load(os.path.join(path, manifest["weights"])))
        state0 = _fill_from_npz(
            manifest["state0_structure"],
            np.load(os.path.join(path, manifest["state0"])))
        return cls(exported, weights, state0, manifest)

    def reset(self) -> None:
        self._state = self._state0
        self.frame_idx = 0

    def step(self, image, cloud, boxes, proj,
             scores: Optional[Any] = None):
        """Track one frame; returns (ids[n], det_score[n]) for the n input
        boxes (n <= manifest max_dets; inputs are padded internally)."""
        import numpy as np

        N = self.manifest["max_dets"]
        boxes = np.asarray(boxes, np.float32)
        n = len(boxes)
        if n > N:
            raise ValueError(f"{n} detections > max_dets {N}")
        boxes_p = np.zeros((N, 4), np.float32)
        boxes_p[:n] = boxes
        det_mask = np.zeros((N,), bool)
        det_mask[:n] = True
        M = self.manifest["cloud_points"]
        cloud = np.asarray(cloud, np.float32)
        if cloud.shape[0] < M:   # pad at z=0 (behind camera: never sampled)
            cloud = np.concatenate(
                [cloud, np.zeros((M - cloud.shape[0],) + cloud.shape[1:],
                                 np.float32)])
        elif cloud.shape[0] > M:
            raise ValueError(f"cloud {cloud.shape[0]} points > manifest {M}")
        self._state, ids, det_score = self._call(
            self._weights, self._state,
            np.asarray(image, np.uint8), cloud, boxes_p, det_mask,
            np.asarray(proj, np.float32))
        self.frame_idx += 1
        return (np.asarray(ids)[:n].tolist(),
                np.asarray(det_score, np.float32)[:n].tolist())
