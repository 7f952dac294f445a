"""Reference-checkpoint conversion + parity harness (CLI).

Closes SURVEY.md §7 step 5 / BASELINE.md's bit-level target: given a
reference ``.pth``/``.pth.tar``, convert it through the name-mapping tables
(compat/mappings.py), merge into a freshly-initialised model, and verify —
per-layer coverage (nothing silently dropped or left at random init) and
golden-fixture agreement of the affinity outputs.

Usage (host CPU is fine):

    python -m mmmot_tpu.compat.parity_check --pth ckpt.pth \
        --config experiments/full_mmmot/config.yaml \
        --dump-goldens goldens.npz          # record outputs of this ckpt
    python -m mmmot_tpu.compat.parity_check --pth ckpt.pth \
        --config ... --goldens goldens.npz  # assert bit-level agreement
    python -m mmmot_tpu.compat.parity_check --pth ckpt.pth --list-keys

Until a real reference checkpoint exists, the harness is exercised by
tests/test_parity_harness.py against synthetically-authored state dicts
carrying the reference key spellings.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np


def _flatten(tree: Mapping, pre=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, pre + (k,)))
        else:
            out[pre + (k,)] = v
    return out


def _merge(dst: Dict, patch: Mapping) -> None:
    for k, v in patch.items():
        if isinstance(v, Mapping) and isinstance(dst.get(k), Mapping):
            _merge(dst[k], v)
        else:
            dst[k] = v


def convert_reference_checkpoint(state_dict: Mapping, model_cfg,
                                 names: Optional[Mapping[str, str]] = None,
                                 variables=None):
    """Convert a reference TrackingNet state dict into flax variables.

    Returns ``(variables, report)`` where ``report`` has:
      converted — flax paths that received reference weights,
      missing   — flax param paths NOT covered (left at init),
      unused    — reference keys not consumed by the mapping,
      shape_errors — converted arrays whose shape mismatches the model.
    ``variables``: pass the model's freshly-initialised variables so
    uncovered params keep their init values; required for partial loads.
    """
    from mmmot_tpu.compat.mappings import mmmot_trackingnet_mapping
    from mmmot_tpu.compat.torch_convert import torch_to_flax

    mapping, kind = mmmot_trackingnet_mapping(model_cfg, names=names)
    params, stats, unused = torch_to_flax(state_dict, mapping, kind)

    report: Dict[str, List] = {"converted": [], "missing": [],
                               "unused": sorted(unused),
                               "shape_errors": []}
    flat_new = {("params",) + k: v for k, v in _flatten(params).items()}
    flat_new.update({("batch_stats",) + k: v
                     for k, v in _flatten(stats).items()})

    if variables is not None:
        flat_old = _flatten(variables)
        for path, v in flat_new.items():
            spath = "/".join(path)
            if path not in flat_old:
                report["shape_errors"].append(
                    f"{spath}: no such param in the model")
                continue
            want = tuple(flat_old[path].shape)
            got = tuple(v.shape)
            if want != got:
                report["shape_errors"].append(
                    f"{spath}: model {want} vs checkpoint {got}")
        report["missing"] = sorted(
            "/".join(p) for p in flat_old
            if p not in flat_new and p[0] in ("params", "batch_stats"))
        import copy

        merged = copy.deepcopy(dict(variables))
        _merge(merged.setdefault("params", {}), params)
        _merge(merged.setdefault("batch_stats", {}), stats)
        out_vars = merged
    else:
        out_vars = {"params": params, "batch_stats": stats}
    report["converted"] = sorted("/".join(p) for p in flat_new)
    return out_vars, report


def golden_batch(model_cfg, data_cfg, seed: int = 0):
    """Deterministic synthetic input batch for golden fixtures."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    N = data_cfg.max_dets
    P = data_cfg.point_len
    h, w = model_cfg.appearance.crop_size
    B, T = 1, 2
    return {
        "crops": jnp.asarray(rng.normal(0, 1, (B, T, N, h, w, 3)),
                             jnp.float32),
        "points": jnp.asarray(rng.normal(0, 1, (B, T, N, P, 4)),
                              jnp.float32),
        "point_mask": jnp.ones((B, T, N, P), bool),
        "det_mask": jnp.broadcast_to(
            jnp.arange(N)[None, None, :] < max(2, N - 1), (B, T, N)),
    }


def compute_outputs(variables, model_cfg, data_cfg, seed: int = 0
                    ) -> Dict[str, np.ndarray]:
    import jax

    from mmmot_tpu.models import model_entry

    net = model_entry(model_cfg)
    batch = golden_batch(model_cfg, data_cfg, seed)
    out = jax.jit(lambda v, b: net.apply(v, b, train=False))(variables,
                                                             batch)
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def dump_goldens(variables, model_cfg, data_cfg, path: str,
                 seed: int = 0) -> None:
    np.savez(path, **compute_outputs(variables, model_cfg, data_cfg, seed))


def check_goldens(variables, model_cfg, data_cfg, path: str,
                  seed: int = 0, atol: float = 0.0) -> Dict[str, float]:
    """Max-abs-diff per output vs a golden fixture; raises above atol."""
    ref = np.load(path)
    got = compute_outputs(variables, model_cfg, data_cfg, seed)
    diffs = {}
    for k in ref.files:
        d = float(np.abs(got[k] - ref[k]).max())
        diffs[k] = d
        if d > atol:
            raise AssertionError(
                f"golden mismatch on {k!r}: max|diff|={d} > atol={atol}")
    return diffs


def main(argv=None):
    import argparse

    from mmmot_tpu.compat.torch_convert import load_torch_checkpoint
    from mmmot_tpu.config import load_config

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--config")
    ap.add_argument("--dump-goldens")
    ap.add_argument("--goldens")
    ap.add_argument("--atol", type=float, default=0.0)
    ap.add_argument("--list-keys", action="store_true")
    ap.add_argument("--allow-pickle", action="store_true")
    ap.add_argument("--names-json",
                    help="JSON dict overriding MMMOT_DEFAULT_NAMES")
    args = ap.parse_args(argv)

    sd = load_torch_checkpoint(args.pth, allow_pickle=args.allow_pickle)
    if args.list_keys:
        for k in sorted(sd):
            shape = tuple(getattr(sd[k], "shape", ()))
            print(k, shape)
        return 0

    import jax

    from mmmot_tpu.models import model_entry

    cfg = load_config(args.config)
    net = model_entry(cfg.model)
    batch = golden_batch(cfg.model, cfg.data)
    variables = jax.jit(
        lambda r, b: net.init({"params": r}, b, train=False))(
        jax.random.PRNGKey(0), batch)
    names = json.loads(open(args.names_json).read()) if args.names_json \
        else None
    variables, report = convert_reference_checkpoint(
        sd, cfg.model, names=names, variables=variables)
    print(json.dumps({
        "converted": len(report["converted"]),
        "missing": report["missing"],
        "unused": report["unused"],
        "shape_errors": report["shape_errors"],
    }, indent=2))
    ok = not report["missing"] and not report["unused"] \
        and not report["shape_errors"]

    if args.dump_goldens:
        dump_goldens(variables, cfg.model, cfg.data, args.dump_goldens)
        print(f"goldens -> {args.dump_goldens}")
    if args.goldens:
        diffs = check_goldens(variables, cfg.model, cfg.data, args.goldens,
                              atol=args.atol)
        print(json.dumps({"golden_max_abs_diff": diffs}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
