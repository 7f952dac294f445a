"""Model zoo: feature branches, fusion, affinity and the composed TrackingNet.

``model_entry`` mirrors the reference factory (reference: models/__init__.py
-> model_entry(config.model)).
"""

from mmmot_tpu.models.tracking_net import TrackingNet
from mmmot_tpu.config import ModelConfig


def model_entry(cfg: ModelConfig) -> TrackingNet:
    return TrackingNet(cfg=cfg)
