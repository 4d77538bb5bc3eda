"""Temporal LiDAR encoders — video networks posing as backbone drop-ins.

Re-designs of team_code/video_resnet.py (R(2+1)D stem wrapper) for the
temporal-LiDAR configuration (lidar_seq_len > 1,
docs/additional_features.md:20): the LiDAR histogram sequence [B,T,H,W,C]
is encoded with factorized spatiotemporal convolutions (2D spatial + 1D
temporal — the R(2+1)D decomposition), collapsing time by the last stage so
the output matches the single-frame encoder interface (4 stage maps).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class R2Plus1DBlock(nn.Module):
  """Factorized 3D conv: spatial 1x3x3 then temporal 3x1x1 (+ residual)."""
  width: int
  spatial_stride: int = 1

  @nn.compact
  def __call__(self, x):
    # x [B,T,H,W,C]
    w_in = x.shape[-1]
    h = nn.Conv(self.width, (1, 3, 3),
                strides=(1, self.spatial_stride, self.spatial_stride),
                use_bias=False, name="spatial")(x)
    h = nn.GroupNorm(num_groups=min(32, self.width), name="norm1")(h)
    h = nn.relu(h)
    h = nn.Conv(self.width, (3, 1, 1), use_bias=False, name="temporal")(h)
    h = nn.GroupNorm(num_groups=min(32, self.width), name="norm2")(h)
    if self.spatial_stride != 1 or w_in != self.width:
      x = nn.Conv(self.width, (1, 1, 1),
                  strides=(1, self.spatial_stride, self.spatial_stride),
                  use_bias=False, name="down")(x)
    return nn.relu(x + h)


class VideoResNet(nn.Module):
  """Temporal encoder returning 4 single-frame-shaped stage maps
  (video_resnet.py:1-45 interface)."""
  widths: Sequence[int] = (32, 64, 128, 256)

  @nn.compact
  def __call__(self, x):
    """x [B,T,H,W,C] -> tuple of 4 maps [B,H/s,W/s,width]."""
    h = nn.Conv(self.widths[0], (1, 3, 3), strides=(1, 2, 2),
                use_bias=False, name="stem")(x)
    h = nn.relu(nn.GroupNorm(num_groups=min(32, self.widths[0]),
                             name="stem_norm")(h))
    feats = []
    for i, w in enumerate(self.widths):
      h = R2Plus1DBlock(w, spatial_stride=2 if i > 0 else 1,
                        name=f"block{i}")(h)
      feats.append(jnp.mean(h, axis=1))     # collapse time per scale
    return tuple(feats)
