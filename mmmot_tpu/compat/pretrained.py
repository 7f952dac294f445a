"""ImageNet-pretrained VGG initialisation from a torchvision checkpoint.

The reference trains from ``torchvision.models.vgg16_bn(pretrained=True)``
(reference: models/appear_net.py; SURVEY.md §2.5/§3.3).  This environment
has no network egress, so instead of downloading we load from a local
``.pth`` file (torchvision's ``vgg16_bn-6c64b313.pth`` state dict, or any
checkpoint containing a VGG-bn trunk — the trunk is auto-located by shape
signature when the standard ``features.N`` prefix is absent).

    variables = load_pretrained_vgg(variables, "vgg16_bn.pth")
    # or: python -m mmmot_tpu.cli.train --config ... --pretrained-vgg x.pth
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

# torchvision classifier head keys — present in every vgg*_bn checkpoint,
# intentionally unused (the reference's appear_net uses only `.features`).
_EXPECTED_UNUSED_PREFIXES = ("classifier.",)


def load_pretrained_vgg(variables: Mapping, pth_path: str, depth: int = 16,
                        allow_pickle: bool = False) -> Tuple[Dict, Dict]:
    """Merge a torchvision vgg<depth>_bn checkpoint into the appearance
    backbone of freshly-initialised model ``variables``.

    Returns (variables, report) where report lists converted paths,
    unexpected-unused torch keys, and shape errors (raises on the latter —
    a width/depth mismatch means the config does not match the checkpoint).
    """
    from mmmot_tpu.compat.mappings import (detect_vgg_prefix,
                                           torchvision_vgg_mapping)
    from mmmot_tpu.compat.parity_check import _flatten, _merge
    from mmmot_tpu.compat.torch_convert import (load_torch_checkpoint,
                                                torch_to_flax)

    sd = load_torch_checkpoint(pth_path, allow_pickle=allow_pickle)
    prefix = detect_vgg_prefix(sd, depth=depth)
    if prefix is None:
        raise ValueError(
            f"no VGG-bn trunk found in {pth_path!r} (expected "
            f"'features.0.weight' [64,3,3,3]-shaped keys)")
    mapping, kind = torchvision_vgg_mapping(depth, torch_prefix=prefix)
    params, stats, unused = torch_to_flax(sd, mapping, kind)

    unexpected = [k for k in unused
                  if not k.startswith(_EXPECTED_UNUSED_PREFIXES)]
    flat_old = _flatten(variables)
    errors = []
    flat_new = {("params",) + k: v for k, v in _flatten(params).items()}
    flat_new.update({("batch_stats",) + k: v
                     for k, v in _flatten(stats).items()})
    for path, v in flat_new.items():
        if path not in flat_old:
            errors.append("/".join(path) + ": not in model")
        elif tuple(flat_old[path].shape) != tuple(v.shape):
            errors.append(f"{'/'.join(path)}: model "
                          f"{tuple(flat_old[path].shape)} vs checkpoint "
                          f"{tuple(v.shape)}")
    if errors:
        raise ValueError(
            "pretrained VGG does not fit this model config (width_mult / "
            "depth mismatch?):\n  " + "\n  ".join(errors[:10]))

    import copy

    merged = copy.deepcopy(dict(variables))
    _merge(merged.setdefault("params", {}), params)
    _merge(merged.setdefault("batch_stats", {}), stats)
    report = {"converted": sorted("/".join(p) for p in flat_new),
              "unexpected_unused": sorted(unexpected)}
    return merged, report
