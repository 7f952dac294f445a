"""Modality fusion (reference: models/fusion_net.py, fusion_module A/B/C).

Variant A: concatenate modalities and project.
Variant B: additive fusion (shared space, sum).
Variant C: attention-gated fusion — a sigmoid gate per modality weighs each
modality's contribution per detection (the paper's headline module; keeps the
tracker robust when a sensor drops out).

All variants return the fused feature *and* pass-through per-modality
features, because the reference scores affinities per branch as well
(sensor-failure robustness is exercised by running single branches alone).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from mmmot_tpu.config import FusionConfig


class FusionModule(nn.Module):
    cfg: FusionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_feat: Optional[jnp.ndarray],
                 lidar_feat: Optional[jnp.ndarray],
                 det_mask=None) -> Dict[str, jnp.ndarray]:
        feats: Dict[str, jnp.ndarray] = {}
        if image_feat is not None:
            feats["image"] = image_feat
        if lidar_feat is not None:
            feats["lidar"] = lidar_feat
        if not feats:
            raise ValueError("fusion needs at least one modality")

        if len(feats) == 1:
            # Dead-sensor degrade: the surviving modality's raw embedding
            # stands in for `fused`.  This path is IN-distribution when
            # sensor-dropout augmentation is on (data/augment.py randomly
            # kills a modality during training, exercising exactly this
            # branch), so downstream fused-affinity heads see it during
            # training; it also matches the reference's robustness scheme
            # of scoring surviving branches rather than re-gating.
            fused = next(iter(feats.values()))
        elif self.cfg.variant == "A":
            cat = jnp.concatenate([image_feat, lidar_feat], axis=-1)
            fused = nn.Dense(self.cfg.out_dim, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="proj")(cat)
        elif self.cfg.variant == "B":
            fused = (nn.Dense(self.cfg.out_dim, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="proj_image")(image_feat)
                     + nn.Dense(self.cfg.out_dim, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="proj_lidar")(lidar_feat))
        elif self.cfg.variant == "C":
            # Attention gate: per-detection sigmoid weight for each modality,
            # computed from the concatenation of both.
            cat = jnp.concatenate([image_feat, lidar_feat], axis=-1)
            gates = nn.Dense(2, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="gate")(cat)
            gates = nn.sigmoid(gates)
            pi = nn.Dense(self.cfg.out_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="proj_image")(image_feat)
            pl_ = nn.Dense(self.cfg.out_dim, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="proj_lidar")(lidar_feat)
            fused = gates[..., 0:1] * pi + gates[..., 1:2] * pl_
        else:
            raise ValueError(f"unknown fusion variant {self.cfg.variant!r}")

        if det_mask is not None:
            fused = fused * det_mask[..., None].astype(fused.dtype)
        out = {"fused": fused}
        if self.cfg.keep_single:
            out.update(feats)
        return out
