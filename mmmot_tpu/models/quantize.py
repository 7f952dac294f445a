"""Int8 post-training quantization of the VGG appearance trunk.

The conv stack is ~85% of the tracking pipeline's device time
(docs/PERFORMANCE.md) and the TPU v5e MXU runs int8 at 2x its bf16 rate
(measured on-chip: 222-304 TOP/s vs 106-158 TFLOP/s on this pipeline's
dominant conv shapes).  This module provides an inference-only int8 path
for the appearance trunk (reference: models/appear_net.py — the reference
has no quantized mode; this is a TPU-native design point like crop-112):

* **weights**: per-output-channel symmetric int8; eval-mode BatchNorm is
  folded into the weights/bias first, so the quantized conv reproduces
  conv+BN in one int8 op;
* **activations**: per-tensor scales calibrated on sample crops (abs-max);
  post-ReLU activations use the non-negative half of the int8 range, so
  the ReLU is the clip itself;
* **compute**: int8 x int8 -> int32 MXU convs; the requantisation
  (per-channel scale + bias + clip) is a small f32 elementwise that XLA
  fuses into the conv epilogue; max-pools run directly on int8 (half the
  HBM bytes of the bf16 path);
* the skip-pool tail (1x1 reduces + BN + projection, <1% of trunk FLOPs)
  stays in float, reading the ORIGINAL variables — only the trunk is
  quantized, so a checkpoint needs no conversion.

Usage:

    scales = calibrate_appearance(variables, cfg.appearance, sample_crops)
    qapp   = quantize_appearance(variables, cfg.appearance, scales)
    module = TrackingModule(net, {**variables, "quant_int8": qapp}, ...)

``TrackingModule.extract`` detects the ``quant_int8`` collection and routes
the image branch through :func:`quantized_appearance_apply`; everything
else (PointNet, fusion, affinity, LP) is unchanged.  The quant pytree rides
the ordinary ``variables`` argument, so jitted window programs / vmap / the
KITTI runner need no new plumbing.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mmmot_tpu.config import AppearanceConfig
from mmmot_tpu.models.appearance import VGG_PLANS, space_to_depth, trunk_ops
from mmmot_tpu.models.layers import MaskedBatchNorm

# BN folding must use the exact eps the float path normalises with, or the
# int8 trunk silently diverges from AppearanceNet if the layer default moves.
_BN_EPS = MaskedBatchNorm.eps

_DN = lax.conv_dimension_numbers((1, 8, 8, 8), (3, 3, 8, 8),
                                 ("NHWC", "HWIO", "NHWC"))


def _folded_trunk(variables, cfg: AppearanceConfig) -> List[tuple]:
    """BN-folded conv params of the trunk, in plan order.

    Returns ``[(W, b), ...]`` with ``W`` the BN-folded f32 kernel
    ``[3, 3, Cin, Cout]`` and ``b`` the folded bias ``[Cout]`` — eval-mode
    BatchNorm collapsed into the conv so one int8 conv reproduces
    conv+BN.  Pool positions come from ``VGG_PLANS[cfg.depth]``.
    """
    params = variables["params"]["appear_net"]["backbone"]
    # No-BN configs create no batch_stats subtree at all — only look the
    # stats up when the fold below will actually read them.
    stats = (variables["batch_stats"]["appear_net"]["backbone"]
             if cfg.batch_norm else {})
    convs: List[tuple] = []
    conv_i = 0
    for item in VGG_PLANS[cfg.depth]:
        if item == "M":
            continue
        w = jnp.asarray(params[f"conv_{conv_i}"]["kernel"], jnp.float32)
        cb = jnp.asarray(params[f"conv_{conv_i}"]["bias"], jnp.float32)
        if cfg.batch_norm:
            bn = params[f"bn_{conv_i}"]
            st = stats[f"bn_{conv_i}"]
            g = (jnp.asarray(bn["scale"], jnp.float32)
                 * lax.rsqrt(jnp.asarray(st["var"], jnp.float32) + _BN_EPS))
            b = jnp.asarray(bn["bias"], jnp.float32) \
                + g * (cb - jnp.asarray(st["mean"], jnp.float32))
            w = w * g[None, None, None, :]
        else:
            b = cb
        convs.append((w, b))
        conv_i += 1
    return convs


def calibrate_appearance(variables, cfg: AppearanceConfig, crops,
                         ) -> Tuple[float, ...]:
    """Per-tensor activation scales from sample crops (abs-max).

    ``crops``: float crops ``[..., H, W, 3]`` (any leading axes) —
    a few hundred representative detections are plenty.  Returns
    ``(input_absmax, conv0_max, conv1_max, ...)`` as python floats.
    """
    convs = _folded_trunk(variables, cfg)
    ops = trunk_ops(cfg.depth, cfg.s2d_stem)
    x = jnp.asarray(crops, jnp.float32)
    x = x.reshape((-1,) + x.shape[-3:])

    # convs/x are ARGUMENTS, not closures: closed-over device arrays are
    # fetched d2h at trace time to embed as MLIR literals — minutes under
    # a stalled axon tunnel (docs/PERFORMANCE.md, round-3 traps).
    @jax.jit
    def run(convs, x):
        maxes = [jnp.max(jnp.abs(x))]
        y = x
        for op in ops:
            if op[0] == "s2d":
                y = space_to_depth(y, 2)
            elif op[0] == "pool":
                y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID")
            elif op[0] == "conv":
                w, b = convs[op[1]]
                y = lax.conv_general_dilated(
                    y, w, (1, 1), "SAME", dimension_numbers=_DN,
                    preferred_element_type=jnp.float32) + b
                y = jnp.maximum(y, 0.0)
                maxes.append(jnp.max(y))
        return jnp.stack(maxes)

    maxes = np.asarray(run(convs, x))
    return tuple(float(m) for m in maxes)


def quantize_appearance(variables, cfg: AppearanceConfig,
                        act_scales: Tuple[float, ...]) -> Dict[str, Any]:
    """Build the int8 trunk pytree from float variables + calibration.

    Per conv layer ``i`` (input activation scale ``s_in``, output
    activation max ``a_i``):

        w_q[c]  = round(W_folded[..., c] / s_w[c]),  s_w[c] = max|W[..., c]|/127
        acc     = conv_int8(x_q, w_q)                       (int32, MXU)
        x_q'    = clip(round(acc * (s_in*s_w[c]/s_out) + b[c]/s_out), 0, 127)

    with ``s_out = a_i / 127``; the clip-at-0 IS the ReLU.  Stage outputs
    keep their scale so global max-pool runs on int8 and dequantizes the
    pooled ``[B, C]`` vector only.
    """
    convs = _folded_trunk(variables, cfg)
    if len(act_scales) != len(convs) + 1:
        raise ValueError(f"need {len(convs) + 1} calibration scales "
                         f"(input + per conv), got {len(act_scales)}")
    s_in = max(float(act_scales[0]), 1e-12) / 127.0
    qlayers: List[Dict[str, Any]] = []
    conv_i = 0
    s_prev = s_in
    for w, b in convs:
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        s_out = max(float(act_scales[conv_i + 1]), 1e-12) / 127.0
        qlayers.append({
            "w": w_q,
            "m": (s_prev * s_w / s_out).astype(jnp.float32),
            "b": jnp.asarray(b / s_out, jnp.float32),
        })
        s_prev = s_out
        conv_i += 1
    # Every leaf is an ARRAY (no python floats): the pytree rides the
    # jitted programs' ``variables`` argument, and aval mapping /
    # device_put expect array leaves.
    return {"in_scale": jnp.float32(s_in),
            "layers": tuple(qlayers),
            # activation scale live at each pool output (= stage output)
            "stage_scales": tuple(jnp.float32(s)
                                  for s in _stage_scales(cfg, act_scales))}


def with_int8_appearance(variables, cfg: AppearanceConfig, sample_crops):
    """Calibrate + quantize in one call; returns a variables dict whose
    extra ``quant_int8`` collection switches ``TrackingModule.extract``
    onto the int8 trunk."""
    scales = calibrate_appearance(variables, cfg, sample_crops)
    quant = quantize_appearance(variables, cfg, scales)
    return {**variables, "quant_int8": quant}


def quantize_for_inference(variables, model_cfg, data_cfg,
                           sequences=None, max_frames: int = 8,
                           n_crops: int = 256):
    """Quantize the appearance trunk for a dataset (``model.int8_appearance``).

    Calibration crops come from REAL frames of ``data_cfg.root``: a few
    frames of the first sequence(s) are loaded, their detections cropped +
    ImageNet-normalised ON DEVICE through the exact preprocessing the
    tracker uses (ops/crop_resize.py), and abs-max activation scales are
    measured on those — never on synthetic noise, whose statistics are
    unrepresentative (quality rows in results/real_tree_quality.json are
    calibrated this way; the int8 trunk measured METRIC-IDENTICAL to bf16
    on the noisy regime at 1.35x the throughput).

    Returns ``{**variables, "quant_int8": ...}``.
    """
    import jax.numpy as jnp
    import numpy as np

    from mmmot_tpu.data.kitti_dataset import KittiTrackingDataset
    from mmmot_tpu.ops.crop_resize import (crop_and_resize_batched,
                                           normalize_crops)

    ds = KittiTrackingDataset(data_cfg, max_cloud_points=4096)
    seqs = list(sequences) if sequences else ds.sequences[:1]
    crops_l = []
    total = 0
    for seq in seqs:
        arrs = ds.load_sequence(seq, max_frames=max_frames)
        images = jnp.asarray(arrs.images)
        boxes = jnp.asarray(arrs.boxes)
        dm = jnp.asarray(arrs.det_mask)
        c = crop_and_resize_batched(
            images.astype(jnp.float32), boxes,
            tuple(model_cfg.appearance.crop_size), dm, method="mxu")
        c = normalize_crops(c, scale=1.0 / 255.0)
        valid = np.asarray(c)[np.asarray(dm)]
        crops_l.append(valid)
        total += len(valid)
        if total >= n_crops:
            break
    calib = np.concatenate(crops_l)[:n_crops]
    if len(calib) == 0:
        raise ValueError(
            f"no detections found in {data_cfg.root!r} to calibrate the "
            "int8 trunk on (model.int8_appearance needs real crops)")
    return with_int8_appearance(variables, model_cfg.appearance,
                                jnp.asarray(calib))


def _stage_scales(cfg: AppearanceConfig,
                  act_scales: Tuple[float, ...]) -> Tuple[float, ...]:
    out: List[float] = []
    conv_i = 0
    for op in trunk_ops(cfg.depth, cfg.s2d_stem):
        if op[0] == "conv":
            conv_i += 1
        elif op[0] == "stage":
            out.append(max(float(act_scales[conv_i]), 1e-12) / 127.0)
    return tuple(out)


def quantized_trunk_stages(quant: Dict[str, Any], cfg: AppearanceConfig,
                           x) -> List[Tuple[jnp.ndarray, float]]:
    """Run the int8 trunk; returns ``[(int8 stage map, dequant scale)]``
    per stage boundary (mirrors ``VGGBackbone.__call__``'s stage list —
    including the s2d stem, where the relayout commutes with the
    per-tensor input quantization)."""
    in_scale = quant["in_scale"]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / in_scale),
                  -127, 127).astype(jnp.int8)
    stages: List[Tuple[jnp.ndarray, float]] = []
    for op in trunk_ops(cfg.depth, cfg.s2d_stem):
        if op[0] == "s2d":
            xq = space_to_depth(xq, 2)
        elif op[0] == "pool":
            xq = lax.reduce_window(xq, jnp.asarray(-128, jnp.int8), lax.max,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        elif op[0] == "stage":
            stages.append((xq, quant["stage_scales"][len(stages)]))
        else:
            q = quant["layers"][op[1]]
            acc = lax.conv_general_dilated(
                xq, q["w"], (1, 1), "SAME", dimension_numbers=_DN,
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * q["m"] + q["b"]
            xq = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
    return stages


def quantized_appearance_apply(quant: Dict[str, Any], variables,
                               cfg: AppearanceConfig, crops, mask=None,
                               dtype=jnp.float32):
    """Eval-mode ``AppearanceNet.__call__`` with the int8 trunk.

    The skip-pool tail (reduce_i Dense + BN + ReLU, concat, proj) runs in
    f32 straight from the ORIGINAL ``variables`` (it is <1% of the FLOPs),
    then casts to ``dtype``.  Output matches ``AppearanceNet`` up to
    quantization error (see tests/test_quantize.py for the bound).
    """
    params = variables["params"]["appear_net"]
    stats = variables["batch_stats"]["appear_net"]
    lead = crops.shape[:-3]
    h, w, c = crops.shape[-3:]
    x = crops.reshape((-1, h, w, c))
    stages = quantized_trunk_stages(quant, cfg, x)

    picked = stages[-3:] if cfg.skip_pool else stages[-1:]
    pooled = []
    for i, (s_q, s_scale) in enumerate(picked):
        p = jnp.max(s_q, axis=(-3, -2)).astype(jnp.float32) * s_scale
        k = jnp.asarray(params[f"reduce_{i}"]["kernel"], jnp.float32)
        b = jnp.asarray(params[f"reduce_{i}"]["bias"], jnp.float32)
        p = p @ k + b
        bn = params[f"reduce_bn_{i}"]
        st = stats[f"reduce_bn_{i}"]
        inv = lax.rsqrt(jnp.asarray(st["var"], jnp.float32) + _BN_EPS)
        p = ((p - jnp.asarray(st["mean"], jnp.float32)) * inv
             * jnp.asarray(bn["scale"], jnp.float32)
             + jnp.asarray(bn["bias"], jnp.float32))
        pooled.append(jnp.maximum(p, 0.0))
    feat = jnp.concatenate(pooled, axis=-1)
    k = jnp.asarray(params["proj"]["kernel"], jnp.float32)
    b = jnp.asarray(params["proj"]["bias"], jnp.float32)
    feat = (feat @ k + b).astype(dtype)
    feat = feat.reshape(lead + (feat.shape[-1],))
    if mask is not None:
        feat = feat * mask[..., None].astype(feat.dtype)
    return feat
