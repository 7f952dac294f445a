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
