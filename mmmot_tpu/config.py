"""Experiment configuration system.

The reference drives every experiment from ``experiments/<name>/config.yaml``
loaded into an attribute dict (reference: ``main.py`` -> ``yaml.safe_load`` +
EasyDict; SURVEY.md §2.19/§5.6).  We keep the same shape of knobs — fusion
variant A/B/C, correlation-op choice, branch on/off switches, point length,
sample length — but as typed dataclasses so that configs are validated at load
time and are hashable/static for ``jax.jit``.

YAML files with the same key spelling as the reference experiments load
directly via :func:`load_config`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import yaml


def _freeze(obj):
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


@dataclass(frozen=True)
class AppearanceConfig:
    """Image appearance branch (reference: models/appear_net.py -> VGG skip pool)."""

    arch: str = "vgg"                  # backbone family
    depth: int = 16                    # VGG depth (11/13/16/19)
    batch_norm: bool = True
    skip_pool: bool = True             # multi-stage skip pooling (reference headline)
    reduction_dim: int = 256           # 1x1-reduced channels per pooled stage
    out_dim: int = 512                 # per-detection embedding size
    crop_size: Tuple[int, int] = (224, 224)
    dropblock: bool = False

    def __post_init__(self):
        if self.depth not in (11, 13, 16, 19):
            raise ValueError(f"VGG depth must be 11/13/16/19, got {self.depth}")
        # Five 2x2 pools: crops must stay >= 1px at the deepest stage.
        if min(self.crop_size) < 32:
            raise ValueError(
                f"crop_size {self.crop_size} too small: VGG has 5 pooling "
                "stages, so crops must be at least 32x32")
        if self.s2d_stem and (self.crop_size[0] % 2 or self.crop_size[1] % 2):
            raise ValueError(
                f"s2d_stem needs even crop dims, got {self.crop_size}")
    dropblock_size: int = 7
    dropblock_rate: float = 0.1
    width_mult: float = 1.0            # channel-width multiplier (TPU extra)
    s2d_stem: bool = False             # TPU space-to-depth stem (NOT the
                                       # reference architecture — gate +
                                       # retrain): a 2x2 space-to-depth
                                       # replaces the first pooling, so the
                                       # stage-1 convs run at half spatial
                                       # resolution on 12 input channels.
                                       # Kills the three structural stem
                                       # costs of faithful VGG at 224²
                                       # (C_in=3 MXU floor, the 64-channel
                                       # high-spatial conv, pool1 HBM
                                       # traffic) at ~4x less stem compute;
                                       # stage output shapes are unchanged
                                       # from stage 1 onward.  Measured in
                                       # docs/PERFORMANCE.md (round 5).


@dataclass(frozen=True)
class PointConfig:
    """LiDAR branch (reference: models/point_net.py -> PointNet_v1)."""

    arch: str = "pointnet"
    point_len: int = 512               # points sampled per detection
    in_dim: int = 4                    # x, y, z, reflectance (+ optional extras)
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    out_dim: int = 512
    use_tnet: bool = False             # input spatial transform (PointNet T-Net)


@dataclass(frozen=True)
class FusionConfig:
    """Modality fusion (reference: models/fusion_net.py, variants A/B/C).

    A = concat + linear, B = additive, C = attention-gated (sigmoid gate per
    modality).  ``keep_single`` keeps per-modality outputs alive so that
    single-sensor inference still works (the paper's robustness story).
    """

    variant: str = "C"                 # "A" | "B" | "C"
    out_dim: int = 512
    keep_single: bool = True

    def __post_init__(self):
        if self.variant not in ("A", "B", "C"):
            raise ValueError(f"fusion variant must be A/B/C, got {self.variant!r}")


@dataclass(frozen=True)
class AffinityConfig:
    """Cross-frame affinity / correlation module (reference: models/gcn.py).

    ``correlation_ops`` selects the pairwise feature interactions; the
    reference experiment names encode these (e.g. ``subabs``).
    """

    correlation_ops: Tuple[str, ...] = ("subabs",)   # subset of {mul, subabs, diff, cosine}
    hidden_dim: int = 512
    num_layers: int = 2                # MLP depth on the pairwise tensor
    gnn_rounds: int = 0                # message-passing refinement rounds over dets
    softmax_mode: str = "dual"         # "dual" row+col softmax | "single" | "none"
    # Learned motion affinity (TPU-native addition; the reference scores
    # links by appearance only — SURVEY §2.8): an MLP of this hidden width
    # over per-pair box-geometry features (models/affinity.py MotionScore)
    # adds a trained motion term to the RAW link score, before
    # normalisation and the new/end heads.  0 = off (faithful default).
    # Unlike the hard IoU gate (assoc.iou_gate) this is a *learned feature*
    # trained end-to-end through the association CE, and unlike gnn_rounds
    # it is mask-independent (boxes are frozen content), so it composes
    # with the fused Pallas kernel AND every hybrid/parallel pre-solve.
    motion_dim: int = 0

    def __post_init__(self):
        bad = set(self.correlation_ops) - {"mul", "subabs", "diff", "cosine"}
        if bad:
            raise ValueError(f"unknown correlation ops {sorted(bad)}")
        if self.softmax_mode not in ("dual", "single", "none"):
            raise ValueError(f"bad softmax_mode {self.softmax_mode!r}")
        if self.motion_dim < 0:
            raise ValueError(f"motion_dim must be >= 0, got "
                             f"{self.motion_dim}")


@dataclass(frozen=True)
class NewEndConfig:
    """Track birth/death heads (reference: models/new_end.py, NewEndIndicator_v2)."""

    version: int = 2
    hidden_dim: int = 256
    pool: str = "max"                  # pooling over affinity rows/cols: max|mean|softmax


@dataclass(frozen=True)
class ModelConfig:
    appearance: AppearanceConfig = field(default_factory=AppearanceConfig)
    point: PointConfig = field(default_factory=PointConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    affinity: AffinityConfig = field(default_factory=AffinityConfig)
    new_end: NewEndConfig = field(default_factory=NewEndConfig)
    use_image: bool = True             # branch on/off switches (sensor dropout)
    use_lidar: bool = True
    feature_dim: int = 512
    score_fusion: str = "add"          # how per-modality affinities combine: add|avg|fused-only
    compute_dtype: str = "float32"     # "bfloat16" on TPU for speed; f32 for parity
    param_dtype: str = "float32"
    remat: bool = False                # gradient-checkpoint the VGG trunk
                                       # (recompute in bwd; ~5x less
                                       # activation memory -> bigger train
                                       # batches / capacities)
    int8_appearance: bool = False      # INFERENCE-ONLY: post-training int8
                                       # quantization of the appearance
                                       # trunk (models/quantize.py; the MXU
                                       # runs int8 at 2x bf16 — measured
                                       # 613.7 vs 455.1 FPS with metric-
                                       # identical noisy-regime quality).
                                       # Honored by the track/export CLIs,
                                       # which calibrate on REAL crops from
                                       # the data root after loading
                                       # weights; ignored by training and
                                       # model_entry (the flax model is
                                       # unchanged — the quant pytree rides
                                       # the variables dict).

    def __post_init__(self):
        # Single-modality operation (dead sensor; keep_single branches)
        # substitutes the surviving branch's raw embedding for ``fused``,
        # and downstream heads + the scan-carry TrackerState are built for
        # fusion.out_dim — mismatched branch dims would surface later as an
        # opaque shape error deep in apply/scan, so reject them here.
        if self.fusion.keep_single:
            if self.use_image and self.appearance.out_dim != self.fusion.out_dim:
                raise ValueError(
                    f"appearance.out_dim={self.appearance.out_dim} must "
                    f"equal fusion.out_dim={self.fusion.out_dim} when "
                    "keep_single is on (single-modality operation feeds "
                    "the branch embedding to fused-dim heads)")
            if self.use_lidar and self.point.out_dim != self.fusion.out_dim:
                raise ValueError(
                    f"point.out_dim={self.point.out_dim} must equal "
                    f"fusion.out_dim={self.fusion.out_dim} when "
                    "keep_single is on (single-modality operation feeds "
                    "the branch embedding to fused-dim heads)")


@dataclass(frozen=True)
class DataConfig:
    root: str = "data/kitti_tracking"
    det_source: str = "pointpillars"   # detection provider (pp / rrc)
    split: str = "val"
    max_dets: int = 64                 # padded detection slots per frame (Nmax)
    sample_max_len: int = 2            # adjacent-frame pairs for training
    crop_size: Tuple[int, int] = (224, 224)
    image_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    point_len: int = 512
    point_source: str = "frustum"      # frustum (2D box) | box3d (3D box)
    score_threshold: float = 0.0
    augmentation: bool = True
    track_class: str = "Car"           # Car | Pedestrian | Cyclist — class
                                       # tracked/written/devkit-scored.
                                       # "All": JOINT single-pass multi-
                                       # class — every class tracked in one
                                       # program (enable assoc.class_gate
                                       # to forbid cross-class links),
                                       # per-class devkit/HOTA scoring
                                       # from the one result set
    cloud_filter: str = "boxes"        # boxes: host-prefilter the scan to
                                       # points projecting into a detection
                                       # box (superset of the device
                                       # frustum criterion) and shrink the
                                       # padded M to a 4096 bucket — full
                                       # box coverage even for >M scans,
                                       # and far fewer host->device bytes.
                                       # none: raw scan truncated to M.
    packed_cache: bool = False         # persist packed whole sequences to
                                       # <root>/.packed/ and memmap them on
                                       # later runs (skips PNG/velodyne
                                       # decode; data/packed_cache.py)

    def __post_init__(self):
        if self.track_class not in ("Car", "Pedestrian", "Cyclist", "All"):
            raise ValueError(
                f"track_class must be Car/Pedestrian/Cyclist/All, "
                f"got {self.track_class!r}")
        if self.point_source not in ("frustum", "box3d"):
            raise ValueError(
                f"point_source must be frustum/box3d, "
                f"got {self.point_source!r}")
        if self.cloud_filter not in ("boxes", "none"):
            raise ValueError(
                f"cloud_filter must be boxes/none, "
                f"got {self.cloud_filter!r}")


@dataclass(frozen=True)
class AssocConfig:
    """Data association solver (replaces reference OR-Tools CBC ILP)."""

    solver: str = "auction"            # auction | sinkhorn | greedy | ilp (host oracle)
    auction_scaling_steps: int = 8     # eps-scaling phases (integer auction
                                       # is exact regardless; this is speed)
    sinkhorn_tau: float = 0.05
    sinkhorn_iters: int = 100
    link_threshold: float = 0.0        # min link score to accept a match
    use_det_scores: bool = False       # LP-level FP rejection via y_det vars
    det_score_weight: float = 1.0      # weight on det logits in the LP
    raw_new_end: bool = False          # feed RAW new/end logits to the LP
                                       # instead of sigmoids: learned
                                       # negativity lets the reject arm win
                                       # for clutter-like dets ([VERIFY]
                                       # which the reference ILP uses;
                                       # sigmoid ships as the default)
    iou_gate: float = 0.0              # > 0: forbid links whose 2D box IoU
                                       # between consecutive frames is
                                       # below this (spatial gate — a
                                       # TPU-native ADDITION; the
                                       # reference ILP scores links by
                                       # appearance only).  Requires box
                                       # information in the pipeline (the
                                       # raw-frames paths, predict/serve
                                       # with boxes).
    iou_weight: float = 0.0            # != 0: add iou_weight * IoU to the
                                       # link scores (soft spatial prior;
                                       # combinable with iou_gate)
    revival_window: int = 0            # 0 = strictly adjacent-frame like
                                       # the reference (SURVEY §3.2
                                       # [VERIFY]: terminated tracks are
                                       # not revived).  K > 0 keeps
                                       # unmatched tracks as GHOSTS for up
                                       # to K frames: a later detection
                                       # matching a ghost revives its ID —
                                       # detector dropouts stop costing an
                                       # ID switch.  Runs via the ghost-
                                       # pool hybrid pre-solve (banded
                                       # batched affinity; sequence.py
                                       # _revival_track).
    class_gate: bool = False           # joint multi-class association
                                       # (data.track_class "All"): forbid
                                       # links between detections of
                                       # different class groups via the
                                       # assoc NEG sentinel.  Requires the
                                       # pipeline to carry per-detection
                                       # class ids (the KITTI paths do).
    ghost_coverage: bool = False       # with revival_window > 0: EMIT a
                                       # constant-velocity extrapolated box
                                       # for each ghost while it is missing
                                       # (<= K frames), so detector dropout
                                       # bursts stop fragmenting the
                                       # trajectory (FRAG/FN) — at the cost
                                       # of an FP per frame whenever the
                                       # track actually ended.  Requires
                                       # box-carrying pipelines (raw-frames
                                       # paths / boxes=...).  Coverage rows
                                       # carry the track's LAST det-head
                                       # confidence as their score, so
                                       # downstream consumers can threshold
                                       # coverage independently of real
                                       # detections.
    coverage_max_miss: int = 0         # > 0: emit coverage boxes only for
                                       # the first m <= revival_window
                                       # missed frames (the REVIVAL still
                                       # spans the full window — this caps
                                       # only the emitted boxes).  0 = no
                                       # cap (emit while missed <= K).
                                       # The FP/FRAG operating-point knob:
                                       # each extra emitted frame buys FRAG
                                       # /FN coverage but costs an FP when
                                       # the track actually ended.
    coverage_min_score: float = 0.0    # emit a ghost's coverage box only
                                       # while its track's last det-head
                                       # confidence (sigmoid) is >= this —
                                       # low-confidence tracks stop paying
                                       # the FP price of coverage.  0 = no
                                       # confidence gate.
    gate_predict: bool = False         # MOTION-PREDICTED spatial gating:
                                       # the iou_gate/iou_weight prior
                                       # compares the current detections
                                       # against each track's constant-
                                       # velocity PREDICTED box (frozen box
                                       # + (missed+1) * last link velocity)
                                       # instead of its stale frozen box —
                                       # a ghost that crossed the frame
                                       # during an occlusion burst gates
                                       # where it IS, not where it was.
                                       # Requires ghost_coverage (the
                                       # velocity is carried state) and a
                                       # spatial gate; runs via the
                                       # sequential scan or the revival
                                       # hybrid pre-solve (velocities are
                                       # decision-dependent, so the plain
                                       # parallel/y_det pre-solves cannot
                                       # carry them).

    def __post_init__(self):
        if self.coverage_max_miss < 0:
            raise ValueError(
                f"coverage_max_miss must be >= 0, "
                f"got {self.coverage_max_miss}")
        if (self.ghost_coverage and self.revival_window
                and self.coverage_max_miss > self.revival_window):
            raise ValueError(
                f"coverage_max_miss={self.coverage_max_miss} exceeds "
                f"revival_window={self.revival_window}: coverage can only "
                "be emitted while the ghost is still in the pool")
        if self.gate_predict:
            if not self.ghost_coverage:
                raise ValueError(
                    "gate_predict needs ghost_coverage (the per-track "
                    "velocity is carried state)")
            if self.iou_gate <= 0.0 and self.iou_weight == 0.0:
                raise ValueError(
                    "gate_predict without iou_gate/iou_weight does "
                    "nothing: configure the spatial gate it predicts for")


@dataclass(frozen=True)
class TrainConfig:
    optimizer: str = "adam"            # adam | sgd
    lr: float = 3e-4
    weight_decay: float = 1e-4
    momentum: float = 0.9
    lr_schedule: str = "step"          # step | cosine | constant
    lr_decay_epochs: Tuple[int, ...] = (20, 30)
    lr_decay_rate: float = 0.1
    warmup_steps: int = 200
    epochs: int = 40
    batch_size: int = 4                # frame pairs per step (per replica)
    compact_capacity: int = 0          # >0: compact-first training forward
                                       # (conv FLOPs on valid dets only)
    grad_clip: float = 10.0
    loss_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)  # link, new, end, det
    seed: int = 0
    log_every: int = 20
    ckpt_dir: str = "checkpoints"
    ckpt_keep: int = 3


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. KITTI-scale tracking is data-parallel over sequences."""

    data_axis: str = "data"
    model_axis: str = "model"
    num_data: int = -1                 # -1 -> all devices
    num_model: int = 1


@dataclass(frozen=True)
class Config:
    name: str = "default"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    assoc: AssocConfig = field(default_factory=AssocConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_NESTED = {
    "model": ModelConfig,
    "data": DataConfig,
    "assoc": AssocConfig,
    "train": TrainConfig,
    "parallel": ParallelConfig,
}
_MODEL_NESTED = {
    "appearance": AppearanceConfig,
    "point": PointConfig,
    "fusion": FusionConfig,
    "affinity": AffinityConfig,
    "new_end": NewEndConfig,
}


def _build(cls, d: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kw = {}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        ftype = fields[k].type
        if isinstance(v, dict):
            sub = _MODEL_NESTED.get(k) or _NESTED.get(k)
            if sub is None:
                raise TypeError(f"config key {k!r} does not take a mapping")
            kw[k] = _build(sub, v)
        elif isinstance(v, list):
            kw[k] = tuple(v)
        else:
            kw[k] = v
    return cls(**kw)


def config_from_dict(d: Dict[str, Any]) -> Config:
    return _build(Config, d)


def config_to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def load_config(path: str) -> Config:
    """Load a YAML experiment config (reference: main.py yaml.safe_load)."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return config_from_dict(raw)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config_to_dict(cfg), f, sort_keys=False)
