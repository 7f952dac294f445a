"""Name-mapping tables: reference PyTorch state dicts -> flax param paths.

Two families of tables (VERDICT r1 item 3 / SURVEY.md §7 step 5):

* :func:`torchvision_vgg_mapping` — the torchvision ``vgg{11,13,16,19}_bn``
  ``features.N`` indexing (firm knowledge: conv at i, bn at i+1, relu at
  i+2, pool takes one index).  Used to initialise the appearance backbone
  from ImageNet-pretrained torchvision checkpoints (reference:
  models/appear_net.py builds ``vgg16_bn(pretrained=True)``).
* :func:`mmmot_trackingnet_mapping` — the full reference ``TrackingNet``
  state dict.  The reference mount was empty in rounds 1-2, so the
  top-level attribute names in :data:`MMMOT_DEFAULT_NAMES` are best-effort
  recalls **[VERIFY against the real checkpoint]**; every name is a single
  table entry, so fixing them against a real ``.pth`` is a one-line edit
  (or pass ``names=`` overrides).  :func:`detect_vgg_prefix` additionally
  auto-locates the VGG trunk inside an arbitrary checkpoint by shape
  signature, so the appearance branch converts even if the attribute
  names differ.

All builders return ``(mapping, kind)`` suitable for
:func:`mmmot_tpu.compat.torch_convert.torch_to_flax`.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

from mmmot_tpu.models.appearance import VGG_PLANS

FlaxPath = Tuple[str, ...]


def torchvision_vgg_mapping(depth: int = 16,
                            torch_prefix: str = "features",
                            flax_prefix: FlaxPath = ("appear_net",
                                                     "backbone"),
                            ) -> Tuple[Dict[str, FlaxPath], Dict[str, str]]:
    """torchvision ``vgg<depth>_bn`` conv trunk -> our VGGBackbone.

    torchvision's ``make_layers(cfg, batch_norm=True)`` emits, per conv:
    ``Conv2d`` (index i), ``BatchNorm2d`` (i+1), ``ReLU`` (i+2); each
    ``MaxPool2d`` takes one index.  The classifier head is intentionally
    not mapped (the reference's appear_net uses only ``.features``).
    """
    mapping: Dict[str, FlaxPath] = {}
    kind: Dict[str, str] = {}
    idx = 0
    ci = 0
    for item in VGG_PLANS[depth]:
        if item == "M":
            idx += 1
        else:
            conv_name = f"{torch_prefix}.{idx}"
            bn_name = f"{torch_prefix}.{idx + 1}"
            mapping[conv_name] = flax_prefix + (f"conv_{ci}",)
            kind[conv_name] = "conv"
            mapping[bn_name] = flax_prefix + (f"bn_{ci}",)
            kind[bn_name] = "bn"
            idx += 3
            ci += 1
    return mapping, kind


def detect_vgg_prefix(state_dict: Mapping, depth: int = 16) -> Optional[str]:
    """Locate the VGG-bn trunk in an arbitrary checkpoint by signature.

    Returns the prefix P such that ``P.0.weight`` is the stem conv
    ([64, 3, 3, 3] shaped), or None.  Handles both bare torchvision dumps
    (prefix "features") and nested module attributes
    ("appear_net.vgg.features", ...).
    """
    for key in state_dict:
        if not key.endswith(".0.weight"):
            continue
        w = state_dict[key]
        shape = tuple(getattr(w, "shape", ()))
        if len(shape) == 4 and shape[1] == 3 and shape[2:] == (3, 3):
            prefix = key[: -len(".0.weight")]
            # Sanity: the matching bn key must exist.
            if f"{prefix}.1.running_mean" in state_dict:
                return prefix
    return None


# Best-effort reference attribute names (SURVEY.md §2.4-2.9).  The reference
# mount was empty when these were written — [VERIFY] each against the real
# TrackingNet state dict and correct here (single source of truth).
MMMOT_DEFAULT_NAMES = {
    "appearance": "appear_net",        # models/appear_net.py branch
    "vgg_features": "appear_net.vgg.features",  # torchvision trunk inside it
    "reduce": "appear_net.reduce",     # skip-pool 1x1 reducers (indexed)
    "appear_proj": "appear_net.proj",  # final appearance projection
    "point": "point_net",              # models/point_net.py branch
    "point_conv": "point_net.conv",    # shared per-point conv1d MLP (indexed)
    "point_bn": "point_net.bn",        # their BNs (indexed)
    "point_proj": "point_net.proj",
    "fusion": "fusion_module",         # models/fusion_net.py
    "affinity": "w_link",              # correlation/affinity head (gcn.py)
    "new_end": "w_new_end",            # models/new_end.py
    "det": "w_det",                    # detection-confidence head
}


def appearance_mapping(depth: int, names: Mapping[str, str],
                       n_reduce: int = 3
                       ) -> Tuple[Dict[str, FlaxPath], Dict[str, str]]:
    """Full appearance branch: VGG trunk + skip-pool reducers + projection.

    Reference reducers are 1x1 convs (converted to Dense); the projection
    is a Linear.
    """
    mapping, kind = torchvision_vgg_mapping(
        depth, torch_prefix=names["vgg_features"],
        flax_prefix=("appear_net", "backbone"))
    for k in range(n_reduce):
        rname = f"{names['reduce']}.{k}"
        mapping[rname] = ("appear_net", f"reduce_{k}")
        kind[rname] = "conv1x1"         # 1x1 conv -> Dense
        bname = f"{names['reduce']}_bn.{k}"
        mapping[bname] = ("appear_net", f"reduce_bn_{k}")
        kind[bname] = "bn"
    mapping[names["appear_proj"]] = ("appear_net", "proj")
    kind[names["appear_proj"]] = "linear"
    return mapping, kind


def pointnet_mapping(names: Mapping[str, str], n_layers: int
                     ) -> Tuple[Dict[str, FlaxPath], Dict[str, str]]:
    """PointNet branch: conv1d(k=1) per-point MLP + BN + projection."""
    mapping: Dict[str, FlaxPath] = {}
    kind: Dict[str, str] = {}
    for i in range(n_layers):
        cname = f"{names['point_conv']}.{i}"
        mapping[cname] = ("point_net", f"mlp_{i}")
        kind[cname] = "conv"            # conv1d k=1 -> Dense
        bname = f"{names['point_bn']}.{i}"
        mapping[bname] = ("point_net", f"bn_{i}")
        kind[bname] = "bn"
    mapping[names["point_proj"]] = ("point_net", "proj")
    kind[names["point_proj"]] = "linear"
    return mapping, kind


def fusion_mapping(names: Mapping[str, str]
                   ) -> Tuple[Dict[str, FlaxPath], Dict[str, str]]:
    """Fusion module (variant C): per-modality projections + sigmoid gate."""
    f = names["fusion"]
    mapping = {
        f"{f}.proj_image": ("fusion", "proj_image"),
        f"{f}.proj_lidar": ("fusion", "proj_lidar"),
        f"{f}.gate": ("fusion", "gate"),
    }
    kind = {k: "linear" for k in mapping}
    return mapping, kind


def affinity_mapping(names: Mapping[str, str], branches=("fused", "image",
                                                         "lidar")
                     ) -> Tuple[Dict[str, FlaxPath], Dict[str, str]]:
    """Affinity heads: per-branch 1x1-conv stacks over the correlation map.

    A 1x1 Conv2d over the [D, Np, Nc] correlation volume is exactly our
    Dense over the feature axis, so weights convert losslessly.
    """
    mapping: Dict[str, FlaxPath] = {}
    kind: Dict[str, str] = {}
    a = names["affinity"]
    for b in branches:
        mapping[f"{a}_{b}.conv.0"] = (f"affinity_{b}", "head_0")
        kind[f"{a}_{b}.conv.0"] = "conv1x1"
        mapping[f"{a}_{b}.bn.0"] = (f"affinity_{b}", "head_bn_0")
        kind[f"{a}_{b}.bn.0"] = "bn"
        mapping[f"{a}_{b}.conv_out"] = (f"affinity_{b}", "head_out")
        kind[f"{a}_{b}.conv_out"] = "conv1x1"
    return mapping, kind


def new_end_mapping(names: Mapping[str, str]
                    ) -> Tuple[Dict[str, FlaxPath], Dict[str, str]]:
    ne = names["new_end"]
    mapping: Dict[str, FlaxPath] = {}
    kind: Dict[str, str] = {}
    for head in ("new", "end"):
        for i in range(2):
            t = f"{ne}.{head}_mlp.{i}"
            mapping[t] = ("new_end", f"{head}_mlp", f"dense_{i}")
            kind[t] = "linear"
    return mapping, kind


def det_head_mapping(names: Mapping[str, str]
                     ) -> Tuple[Dict[str, FlaxPath], Dict[str, str]]:
    d = names["det"]
    mapping = {f"{d}.0": ("det_head", "dense_0"),
               f"{d}.1": ("det_head", "dense_1")}
    kind = {k: "linear" for k in mapping}
    return mapping, kind


def mmmot_trackingnet_mapping(model_cfg,
                              names: Optional[Mapping[str, str]] = None,
                              ) -> Tuple[Dict[str, FlaxPath], Dict[str, str]]:
    """Full reference TrackingNet state dict -> flax variables.

    ``model_cfg`` is :class:`mmmot_tpu.config.ModelConfig` (drives depth,
    branch presence, and PointNet layer count).  Pass ``names`` to override
    any [VERIFY] attribute name in :data:`MMMOT_DEFAULT_NAMES`.
    """
    from mmmot_tpu.models.tracking_net import score_branches

    nm = dict(MMMOT_DEFAULT_NAMES)
    if names:
        nm.update(names)
    mapping: Dict[str, FlaxPath] = {}
    kind: Dict[str, str] = {}

    def add(m, k):
        mapping.update(m)
        kind.update(k)

    if model_cfg.use_image:
        add(*appearance_mapping(model_cfg.appearance.depth, nm))
    if model_cfg.use_lidar:
        add(*pointnet_mapping(nm, n_layers=len(model_cfg.point.channels)))
    if model_cfg.use_image and model_cfg.use_lidar:
        add(*fusion_mapping(nm))
    add(*affinity_mapping(nm, branches=score_branches(model_cfg)))
    add(*new_end_mapping(nm))
    add(*det_head_mapping(nm))
    return mapping, kind
