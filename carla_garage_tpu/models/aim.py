"""AIM — camera-only baseline backbone (team_code/aim.py:10-74).

A single image encoder whose pooled features drive the same planning heads
as TransFuser (the reference feeds a dummy LiDAR at the agent level,
sensor_agent.py:400-403; here the LiDAR branch simply doesn't exist)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from carla_garage_tpu.models.backbones import make_encoder


class AIMBackbone(nn.Module):
  arch: str = "regnety_032"
  out_features: int = 256

  @nn.compact
  def __call__(self, rgb):
    feats = make_encoder(self.arch).copy(name="encoder")(rgb)
    pooled = jnp.mean(feats[-1], axis=(1, 2))
    return feats[-1], nn.Dense(self.out_features, name="proj")(pooled)
