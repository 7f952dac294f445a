"""mmmot_tpu — a TPU-native multi-object tracking framework.

A brand-new JAX/XLA/Pallas rebuild of the capabilities of the reference
``ZwwWayne/mmMOT`` (ICCV 2019, "Robust Multi-Modality Multi-Object Tracking"):
multi-modal (image + LiDAR) appearance features, attention-gated fusion,
cross-frame affinity scoring with start/end/link heads, and exact
linear-program data association — all expressed as batched, masked,
fixed-shape computations that compile onto TPU via ``jit``/``pjit``.

Layout (mirrors SURVEY.md §7):
    configs/   dataclass configs mirroring the reference experiment knobs
    data/      KITTI tracking I/O + padded-slot packers (host side)
    models/    flax modules: appearance (VGG skip-pool), PointNet, fusion,
               affinity/correlation, new/end heads, the composed TrackingNet
    ops/       masked primitives shared across models
    assoc/     data association: exact host ILP oracle, in-graph auction LAP,
               Sinkhorn-LP, greedy
    tracker/   functional online tracker + lax.scan whole-sequence streaming
    kernels/   Pallas TPU kernels for the hot paths
    eval/      KITTI tracking devkit port (CLEAR MOT metrics)
    train/     optax training loop, losses, orbax checkpointing
    parallel/  mesh/sharding helpers (data-parallel sequence streaming)
    compat/    PyTorch checkpoint -> JAX parameter conversion
    cli/       train / track entry points
"""

__version__ = "0.3.0"
