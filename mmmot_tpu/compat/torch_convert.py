"""PyTorch -> JAX checkpoint conversion (one-way).

The reference ships ``.pth.tar`` checkpoints (reference: utils/train_util.py
save_checkpoint / load_state).  Converting them is required for weight-level
parity runs (SURVEY.md §7 step 5).  Layout conversions:

* Conv2d weight  [O, I, kH, kW] -> flax Conv kernel [kH, kW, I, O]
* Linear weight  [O, I]         -> flax Dense kernel [I, O]
* Conv1d weight  [O, I, k]      -> Dense kernel [I, O] when k == 1 (the
  reference's PointNet uses 1x1 conv1d as a shared per-point MLP, which this
  rebuild expresses as Dense over the channel axis)
* BatchNorm{1,2}d (weight, bias, running_mean, running_var) ->
  params{scale, bias} + batch_stats{mean, var}

``torch_to_flax`` walks a name-mapping table from reference parameter names
to flax paths; unmapped source keys are reported so nothing silently drops.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_conv_weight(w) -> np.ndarray:
    """torch Conv2d [O, I, kH, kW] -> flax [kH, kW, I, O]."""
    w = _to_np(w)
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 3:  # Conv1d with k==1 -> Dense
        if w.shape[-1] != 1:
            raise ValueError(f"conv1d kernel size {w.shape[-1]} != 1")
        return np.transpose(w[..., 0], (1, 0))
    raise ValueError(f"unexpected conv weight shape {w.shape}")


def convert_linear_weight(w) -> np.ndarray:
    """torch Linear [O, I] -> flax Dense [I, O]."""
    return np.transpose(_to_np(w), (1, 0))


def convert_conv1x1_weight(w) -> np.ndarray:
    """torch 1x1 Conv{1,2}d [O, I, 1(, 1)] -> flax Dense [I, O].

    The reference uses 1x1 convs as pointwise linear maps (skip-pool
    reducers, affinity heads over the correlation volume); this rebuild
    expresses those as Dense over the feature axis.
    """
    w = _to_np(w)
    if w.ndim == 4 and w.shape[2:] == (1, 1):
        w = w[..., 0, 0]
    elif w.ndim == 3 and w.shape[-1] == 1:
        w = w[..., 0]
    elif w.ndim != 2:
        raise ValueError(f"not a 1x1 conv weight: shape {w.shape}")
    return np.transpose(w, (1, 0))


def convert_bn(prefix: str, sd: Mapping[str, Any]
               ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """BN params+stats from a torch state-dict prefix."""
    params = {"scale": _to_np(sd[f"{prefix}.weight"]),
              "bias": _to_np(sd[f"{prefix}.bias"])}
    stats = {"mean": _to_np(sd[f"{prefix}.running_mean"]),
             "var": _to_np(sd[f"{prefix}.running_var"])}
    return params, stats


def load_torch_checkpoint(path: str,
                          allow_pickle: bool = False) -> Dict[str, Any]:
    """Load a reference .pth/.pth.tar checkpoint to a flat state dict.

    Loads with ``weights_only=True`` by default: reference checkpoints are
    untrusted public content, and full pickle deserialization executes
    arbitrary code.  Plain tensor state dicts (all reference checkpoints)
    load fine this way; pass ``allow_pickle=True`` to explicitly opt in to
    unsafe loading for exotic archives.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise
        import warnings

        warnings.warn(
            "weights_only load failed; falling back to UNSAFE pickle "
            "deserialization because allow_pickle=True was passed")
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k.replace("module.", "", 1) if k.startswith("module.") else k: v
            for k, v in obj.items()}


def _set_path(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_to_flax(state_dict: Mapping[str, Any],
                  mapping: Mapping[str, Tuple[str, ...]],
                  kind: Optional[Mapping[str, str]] = None
                  ) -> Tuple[Dict, Dict, List[str]]:
    """Convert by explicit name map.

    mapping: torch prefix -> flax path tuple, where the torch prefix names a
    *module* ("backbone.features.0" for a conv, ".1" for its BN, "fc" for a
    linear).  ``kind`` overrides auto-detection with "conv"|"linear"|"bn".
    Returns (params, batch_stats, unused_torch_keys).
    """
    kind = kind or {}
    params: Dict = {}
    batch_stats: Dict = {}
    used = set()
    for tname, fpath in mapping.items():
        k = kind.get(tname)
        wkey = f"{tname}.weight"
        if k is None:
            if f"{tname}.running_mean" in state_dict:
                k = "bn"
            elif wkey in state_dict and _to_np(state_dict[wkey]).ndim >= 3:
                k = "conv"
            else:
                k = "linear"
        if k == "bn":
            p, s = convert_bn(tname, state_dict)
            for name, v in p.items():
                _set_path(params, fpath + (name,), v)
            for name, v in s.items():
                _set_path(batch_stats, fpath + (name,), v)
            used |= {f"{tname}.{x}" for x in
                     ("weight", "bias", "running_mean", "running_var",
                      "num_batches_tracked")}
        else:
            conv = {"conv": convert_conv_weight,
                    "conv1x1": convert_conv1x1_weight,
                    "linear": convert_linear_weight}[k]
            _set_path(params, fpath + ("kernel",), conv(state_dict[wkey]))
            used.add(wkey)
            bkey = f"{tname}.bias"
            if bkey in state_dict:
                _set_path(params, fpath + ("bias",), _to_np(state_dict[bkey]))
                used.add(bkey)
    unused = [k for k in state_dict if k not in used
              and not k.endswith("num_batches_tracked")]
    return params, batch_stats, unused
