"""Config system: YAML round-trip, validation, unknown keys."""

import dataclasses

import pytest
import yaml

from mmmot_tpu.config import (AffinityConfig, AppearanceConfig, Config,
                              FusionConfig, config_from_dict, config_to_dict,
                              load_config, save_config)


def test_default_roundtrip(tmp_path):
    cfg = Config()
    p = tmp_path / "c.yaml"
    save_config(cfg, str(p))
    cfg2 = load_config(str(p))
    assert cfg == cfg2


def test_tiny_experiment_loads():
    cfg = load_config("experiments/tiny_debug/config.yaml")
    assert cfg.name == "tiny_debug"
    assert cfg.model.fusion.variant == "C"
    assert cfg.model.affinity.correlation_ops == ("subabs",)


def test_noisy_experiment_exposes_mitigation_stack():
    """The best published noisy-regime quality row (y_det + revival + gate,
    results/real_tree_quality.json) must be reproducible from config alone:
    experiments/full_mmmot_noisy exposes every knob of the stack."""
    cfg = load_config("experiments/full_mmmot_noisy/config.yaml")
    assert cfg.name == "full_mmmot_noisy"
    assert cfg.assoc.use_det_scores and cfg.assoc.raw_new_end
    # Round-5 swept operating point (cover_k4_m1,
    # results/real_tree_quality.json): K=4 revival, coverage emission
    # capped at the first missed frame.
    assert cfg.assoc.revival_window == 4
    assert cfg.assoc.iou_gate == 0.1 and cfg.assoc.iou_weight == 1.0
    assert cfg.assoc.ghost_coverage
    assert cfg.assoc.coverage_max_miss == 1
    assert cfg.data.det_source == "noisy"
    # The stack must resolve onto the ghost-pool hybrid pre-solve (the
    # throughput-preserving path), not the fully sequential scan.
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule

    net = model_entry(cfg.model)
    m = TrackingModule(net, {"params": {}}, cfg.assoc,
                       use_pallas_affinity=False)
    assert m.hybrid_presolve and not m.parallel_assoc
    assert m.spatial_gating and m.ghost_coverage and m.carry_boxes


def test_lookalike_experiment_exposes_gnn_stack():
    """The best adversarial-regime row (gnn2_stack_k4,
    results/adversarial_gnn.json) must be reproducible from config alone:
    experiments/full_mmmot_lookalike turns on message passing + the
    mitigation stack, and the fused Pallas kernel must still be
    supported (round 5: the hops run outside the kernel)."""
    cfg = load_config("experiments/full_mmmot_lookalike/config.yaml")
    assert cfg.name == "full_mmmot_lookalike"
    assert cfg.model.affinity.gnn_rounds == 2
    assert cfg.assoc.use_det_scores and cfg.assoc.raw_new_end
    assert cfg.assoc.revival_window == 4 and cfg.assoc.ghost_coverage
    assert cfg.assoc.iou_gate == 0.1 and cfg.assoc.iou_weight == 1.0

    from mmmot_tpu.kernels.affinity_kernel import pallas_supported
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.tracker import TrackingModule

    assert pallas_supported(cfg.model)
    net = model_entry(cfg.model)
    m = TrackingModule(net, {"params": {}}, cfg.assoc,
                       use_pallas_affinity=False)
    # gnn features are mask-dependent: the y_det+revival stack must fall
    # back to the sequential scan (hybrid pre-solve auto-disabled), never
    # silently run an unsound pre-solve.
    assert not m.hybrid_presolve and not m.parallel_assoc


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump({"model": {"fusionn": {}}}))
    with pytest.raises(KeyError, match="fusionn"):
        load_config(str(p))


@pytest.mark.parametrize("cls,kw", [
    (FusionConfig, {"variant": "Z"}),
    (AppearanceConfig, {"depth": 15}),
    (AppearanceConfig, {"crop_size": (8, 8)}),
    (AffinityConfig, {"correlation_ops": ("xor",)}),
    (AffinityConfig, {"softmax_mode": "triple"}),
])
def test_validation(cls, kw):
    with pytest.raises(ValueError):
        cls(**kw)


def test_lists_become_tuples():
    cfg = config_from_dict({"model": {"affinity":
                                      {"correlation_ops": ["mul", "subabs"]}}})
    assert cfg.model.affinity.correlation_ops == ("mul", "subabs")
