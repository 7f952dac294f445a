"""Reference-checkpoint conversion tables + golden-fixture harness.

Authors torch state dicts carrying the REFERENCE key spellings
(torchvision ``features.N`` indexing; mmMOT TrackingNet attribute names per
compat/mappings.MMMOT_DEFAULT_NAMES) and proves:

1. the full-model mapping consumes every key (``unused == []``) and covers
   every flax param (``missing == []``) with correct shapes;
2. the torchvision-VGG table is numerically right: our backbone with
   converted weights reproduces a torch ``features``-style Sequential
   bit-for-bit (fp32 tolerance);
3. golden fixtures round-trip (dump -> check passes, perturbation fails).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from mmmot_tpu.compat.mappings import (MMMOT_DEFAULT_NAMES,
                                       detect_vgg_prefix,
                                       mmmot_trackingnet_mapping,
                                       torchvision_vgg_mapping)
from mmmot_tpu.compat.parity_check import (check_goldens,
                                           convert_reference_checkpoint,
                                           dump_goldens, golden_batch)
from mmmot_tpu.compat.torch_convert import torch_to_flax
from mmmot_tpu.config import (AffinityConfig, AppearanceConfig, DataConfig,
                              FusionConfig, ModelConfig, NewEndConfig,
                              PointConfig)
from mmmot_tpu.models import model_entry
from mmmot_tpu.models.appearance import VGG_PLANS, VGGBackbone

DEPTH = 11          # small but same plan structure as 16/19
WM = 0.0625         # tiny channels for CPU speed


def tiny_cfg():
    return ModelConfig(
        appearance=AppearanceConfig(depth=DEPTH, crop_size=(32, 32),
                                    reduction_dim=16, out_dim=32,
                                    width_mult=WM),
        point=PointConfig(point_len=8, channels=(16, 32), out_dim=32),
        fusion=FusionConfig(variant="C", out_dim=32),
        affinity=AffinityConfig(hidden_dim=16),
        new_end=NewEndConfig(hidden_dim=16),
    )


def torchvision_style_features(depth, width_mult, in_ch=3):
    """nn.Sequential with torchvision make_layers(bn=True) indexing."""
    layers = []
    c = in_ch
    for item in VGG_PLANS[depth]:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            oc = max(8, int(item * width_mult))
            layers += [nn.Conv2d(c, oc, 3, padding=1), nn.BatchNorm2d(oc),
                       nn.ReLU(inplace=True)]
            c = oc
    return nn.Sequential(*layers)


def _randomize(model, rng):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
                m.running_mean.copy_(torch.tensor(
                    rng.normal(0, 0.5, m.running_mean.shape[0]),
                    dtype=torch.float32))
                m.running_var.copy_(torch.tensor(
                    rng.uniform(0.5, 2.0, m.running_var.shape[0]),
                    dtype=torch.float32))
                m.weight.copy_(torch.tensor(
                    rng.normal(1, 0.2, m.weight.shape[0]),
                    dtype=torch.float32))
                m.bias.copy_(torch.tensor(
                    rng.normal(0, 0.2, m.bias.shape[0]),
                    dtype=torch.float32))


def test_torchvision_vgg_trunk_numeric_parity():
    """Converted torchvision-style features == our VGGBackbone stages."""
    torch.manual_seed(0)
    feats = torchvision_style_features(DEPTH, WM).eval()
    _randomize(feats, np.random.default_rng(1))
    sd = feats.state_dict()

    mapping, kind = torchvision_vgg_mapping(DEPTH, torch_prefix="",
                                            flax_prefix=())
    # torch_prefix="" yields keys like ".0"; strip the leading dot.
    mapping = {k.lstrip("."): v for k, v in mapping.items()}
    kind = {k.lstrip("."): v for k, v in kind.items()}
    params, stats, unused = torch_to_flax(sd, mapping, kind)
    assert unused == []

    x = np.random.default_rng(2).normal(0, 1, (4, 32, 32, 3)).astype(
        np.float32)
    net = VGGBackbone(depth=DEPTH, width_mult=WM)
    stages = jax.jit(lambda v, x: net.apply(v, x, train=False))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))

    with torch.no_grad():
        tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        t_stages = []
        for layer in feats:
            tx = layer(tx)
            if isinstance(layer, nn.MaxPool2d):
                t_stages.append(tx.numpy().transpose(0, 2, 3, 1))
    assert len(stages) == len(t_stages)
    for s, t in zip(stages, t_stages):
        assert np.abs(np.asarray(s) - t).max() < 1e-4


def build_reference_state_dict(cfg, rng):
    """A full TrackingNet state dict with reference key spellings."""
    nm = MMMOT_DEFAULT_NAMES
    sd = {}

    def conv2d(name, i, o, k=3):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(0, 0.1, (o, i, k, k)), dtype=torch.float32)
        sd[f"{name}.bias"] = torch.tensor(
            rng.normal(0, 0.1, o), dtype=torch.float32)

    def conv1d(name, i, o):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(0, 0.1, (o, i, 1)), dtype=torch.float32)
        sd[f"{name}.bias"] = torch.tensor(
            rng.normal(0, 0.1, o), dtype=torch.float32)

    def linear(name, i, o):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(0, 0.1, (o, i)), dtype=torch.float32)
        sd[f"{name}.bias"] = torch.tensor(
            rng.normal(0, 0.1, o), dtype=torch.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(1, 0.1, c), dtype=torch.float32)
        sd[f"{name}.bias"] = torch.tensor(
            rng.normal(0, 0.1, c), dtype=torch.float32)
        sd[f"{name}.running_mean"] = torch.tensor(
            rng.normal(0, 0.3, c), dtype=torch.float32)
        sd[f"{name}.running_var"] = torch.tensor(
            rng.uniform(0.5, 2.0, c), dtype=torch.float32)
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    # Appearance: vgg trunk + reducers + proj.
    idx = 0
    c = 3
    stage_ch = []
    for item in VGG_PLANS[cfg.appearance.depth]:
        if item == "M":
            stage_ch.append(c)
            idx += 1
        else:
            oc = max(8, int(item * cfg.appearance.width_mult))
            conv2d(f"{nm['vgg_features']}.{idx}", c, oc)
            bn(f"{nm['vgg_features']}.{idx + 1}", oc)
            c = oc
            idx += 3
    rd = cfg.appearance.reduction_dim
    for k, sc in enumerate(stage_ch[-3:]):
        sd[f"{nm['reduce']}.{k}.weight"] = torch.tensor(
            rng.normal(0, 0.1, (rd, sc, 1, 1)), dtype=torch.float32)
        sd[f"{nm['reduce']}.{k}.bias"] = torch.tensor(
            rng.normal(0, 0.1, rd), dtype=torch.float32)
        bn(f"{nm['reduce']}_bn.{k}", rd)
    linear(nm["appear_proj"], 3 * rd, cfg.appearance.out_dim)

    # PointNet.
    pc = 4
    for i, ch in enumerate(cfg.point.channels):
        conv1d(f"{nm['point_conv']}.{i}", pc, ch)
        bn(f"{nm['point_bn']}.{i}", ch)
        pc = ch
    linear(nm["point_proj"], pc, cfg.point.out_dim)

    # Fusion (variant C).
    D = cfg.fusion.out_dim
    linear(f"{nm['fusion']}.proj_image", cfg.appearance.out_dim, D)
    linear(f"{nm['fusion']}.proj_lidar", cfg.point.out_dim, D)
    linear(f"{nm['fusion']}.gate", 2 * D, 2)

    # Affinity heads (1x1 convs over the correlation volume).
    hd = cfg.affinity.hidden_dim
    n_ops = len(cfg.affinity.correlation_ops)
    for b in ("fused", "image", "lidar"):
        din = {"fused": D, "image": cfg.appearance.out_dim,
               "lidar": cfg.point.out_dim}[b] * n_ops
        sd[f"{nm['affinity']}_{b}.conv.0.weight"] = torch.tensor(
            rng.normal(0, 0.1, (hd, din, 1, 1)), dtype=torch.float32)
        sd[f"{nm['affinity']}_{b}.conv.0.bias"] = torch.tensor(
            rng.normal(0, 0.1, hd), dtype=torch.float32)
        bn(f"{nm['affinity']}_{b}.bn.0", hd)
        sd[f"{nm['affinity']}_{b}.conv_out.weight"] = torch.tensor(
            rng.normal(0, 0.1, (1, hd, 1, 1)), dtype=torch.float32)
        sd[f"{nm['affinity']}_{b}.conv_out.bias"] = torch.tensor(
            rng.normal(0, 0.1, 1), dtype=torch.float32)

    # New/end heads + det head.
    nh = cfg.new_end.hidden_dim
    for head in ("new", "end"):
        linear(f"{nm['new_end']}.{head}_mlp.0", D + 1, nh)
        linear(f"{nm['new_end']}.{head}_mlp.1", nh, 1)
    linear(f"{nm['det']}.0", D, cfg.new_end.hidden_dim)
    linear(f"{nm['det']}.1", cfg.new_end.hidden_dim, 1)
    return sd


def test_full_model_conversion_complete(tmp_path):
    cfg = tiny_cfg()
    rng = np.random.default_rng(3)
    sd = build_reference_state_dict(cfg, rng)

    net = model_entry(cfg)
    data = DataConfig(max_dets=4, point_len=8, crop_size=(32, 32))
    batch = golden_batch(cfg, data)
    variables = jax.jit(lambda r, b: net.init({"params": r}, b,
                                              train=False))(
        jax.random.PRNGKey(0), batch)
    converted, report = convert_reference_checkpoint(sd, cfg,
                                                     variables=variables)
    assert report["unused"] == []
    assert report["missing"] == []
    assert report["shape_errors"] == []

    # Forward with converted weights is finite and uses them (differs from
    # the random init's outputs).
    out_conv = jax.jit(lambda v, b: net.apply(v, b, train=False))(
        converted, batch)
    out_init = jax.jit(lambda v, b: net.apply(v, b, train=False))(
        variables, batch)
    for k, v in out_conv.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert np.abs(np.asarray(out_conv["link"])
                  - np.asarray(out_init["link"])).max() > 1e-6

    # Golden fixtures: dump with the converted weights, re-check exactly;
    # a perturbed model must fail.
    g = str(tmp_path / "goldens.npz")
    dump_goldens(converted, cfg, data, g)
    diffs = check_goldens(converted, cfg, data, g, atol=0.0)
    assert max(diffs.values()) == 0.0
    bad = jax.tree.map(lambda x: x, converted)
    bad["params"]["det_head"]["dense_1"]["bias"] = \
        bad["params"]["det_head"]["dense_1"]["bias"] + 1.0
    with pytest.raises(AssertionError):
        check_goldens(bad, cfg, data, g, atol=1e-6)


def test_detect_vgg_prefix():
    # Bare torchvision dump.
    sd = {"features.0.weight": torch.zeros(64, 3, 3, 3),
          "features.1.running_mean": torch.zeros(64)}
    assert detect_vgg_prefix(sd) == "features"
    # Nested under an arbitrary module attribute.
    sd2 = {"other.features.0.weight": torch.zeros(64, 3, 3, 3),
           "other.features.1.running_mean": torch.zeros(64),
           "decoy.0.weight": torch.zeros(64, 64, 3, 3)}
    assert detect_vgg_prefix(sd2) == "other.features"
    # The authored reference dict's trunk is found too (tiny 8-ch stem).
    cfg = tiny_cfg()
    sd3 = build_reference_state_dict(cfg, np.random.default_rng(4))
    assert detect_vgg_prefix(sd3) == MMMOT_DEFAULT_NAMES["vgg_features"]


def test_mapping_covers_flagship_shapes():
    """The vgg16 table indexes match torchvision's real layout."""
    mapping, kind = torchvision_vgg_mapping(16)
    # vgg16_bn: 13 convs; last conv index in features is 40.
    convs = [k for k, v in kind.items() if v == "conv"]
    assert len(convs) == 13
    idxs = sorted(int(k.split(".")[1]) for k in convs)
    assert idxs == [0, 3, 7, 10, 14, 17, 20, 24, 27, 30, 34, 37, 40]


def test_load_pretrained_vgg(tmp_path):
    """torchvision-style vgg_bn .pth initialises the appearance backbone."""
    import jax
    import jax.numpy as jnp

    from mmmot_tpu.compat.pretrained import load_pretrained_vgg
    from mmmot_tpu.config import DataConfig
    from mmmot_tpu.compat.parity_check import golden_batch

    cfg = tiny_cfg()
    torch.manual_seed(1)
    feats = torchvision_style_features(DEPTH, WM).eval()
    _randomize(feats, np.random.default_rng(5))
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    # Classifier keys must be tolerated as expected-unused.
    sd["classifier.0.weight"] = torch.zeros(10, 25088)
    sd["classifier.0.bias"] = torch.zeros(10)
    path = str(tmp_path / "vgg.pth")
    torch.save(sd, path)

    net = model_entry(cfg)
    data = DataConfig(max_dets=4, point_len=8, crop_size=(32, 32))
    batch = golden_batch(cfg, data)
    variables = jax.jit(lambda r, b: net.init({"params": r}, b,
                                              train=False))(
        jax.random.PRNGKey(0), batch)
    loaded, report = load_pretrained_vgg(variables, path, depth=DEPTH)
    assert report["unexpected_unused"] == []
    # Stem conv now carries the torch weights (and differs from the init).
    got = np.asarray(
        loaded["params"]["appear_net"]["backbone"]["conv_0"]["kernel"])
    want = np.transpose(sd["features.0.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    init = np.asarray(
        variables["params"]["appear_net"]["backbone"]["conv_0"]["kernel"])
    assert np.abs(got - init).max() > 1e-4
    # Other branches keep their init values.
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["point_net"]["proj"]["kernel"]),
        np.asarray(variables["params"]["point_net"]["proj"]["kernel"]))
    # Width mismatch raises a clear error.
    with pytest.raises(ValueError):
        wrong = model_entry(tiny_cfg())
        bad_feats = torchvision_style_features(DEPTH, WM * 2).eval()
        bsd = {f"features.{k}": v for k, v in
               bad_feats.state_dict().items()}
        bp = str(tmp_path / "bad.pth")
        torch.save(bsd, bp)
        load_pretrained_vgg(variables, bp, depth=DEPTH)
