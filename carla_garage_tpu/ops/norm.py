"""Layout-preserving GroupNorm for TPU.

flax's nn.GroupNorm reshapes [B, ..., C] -> [B, ..., G, C/G] to reduce per
group. On TPU the trailing-two-dims tiling makes that reshape a PHYSICAL
transpose of the whole feature map: the r4 XProf op table of the full-spec
TransFuser step showed ~38% of device time in GroupNorm stat fusions and
another ~32% in the 5-D layout copies around them, while the convolutions
(the actual FLOPs) took ~1% — GroupNorm, not the MXU, was the wall.

This implementation never changes the feature map's layout:
  1. per-CHANNEL moments over the spatial axes (an NHWC-native [B,C]
     reduce that XLA fuses into the producer),
  2. group aggregation on the tiny [B,C] moment arrays (reshape of a
     [B,C] array is free),
  3. one fused elementwise pass x*a + b with per-(B,C) a,b broadcast back
     to channels.

Numerics match nn.GroupNorm (same eps, f32 stats): the group mean equals
the mean of its channels' means because every channel has the same pixel
count, and E[x^2]-E[x]^2 matches flax's variance formulation.
Param names/shapes ("scale"/"bias", [C]) are identical to nn.GroupNorm so
existing checkpoints load unchanged.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def group_norm_stats(x: jnp.ndarray, num_groups: int):
  """Per-(B, group) mean/inv-std without reshaping x. x: [B, ..., C]."""
  C = x.shape[-1]
  assert C % num_groups == 0, (C, num_groups)
  spatial = tuple(range(1, x.ndim - 1))
  xf = x.astype(jnp.float32)
  m1 = jnp.mean(xf, axis=spatial)                      # [B,C]
  m2 = jnp.mean(jnp.square(xf), axis=spatial)          # [B,C]
  B = x.shape[0]
  gm1 = m1.reshape(B, num_groups, C // num_groups).mean(-1)   # [B,G]
  gm2 = m2.reshape(B, num_groups, C // num_groups).mean(-1)
  var = jnp.maximum(gm2 - jnp.square(gm1), 0.0)
  return gm1, var


class TpuGroupNorm(nn.Module):
  """Drop-in replacement for nn.GroupNorm (NHWC / channels-last input)."""
  num_groups: int
  epsilon: float = 1e-6

  @nn.compact
  def __call__(self, x):
    C = x.shape[-1]
    G = self.num_groups
    scale = self.param("scale", nn.initializers.ones, (C,))
    bias = self.param("bias", nn.initializers.zeros, (C,))
    mean_g, var_g = group_norm_stats(x, G)
    inv_g = lax.rsqrt(var_g + self.epsilon)             # [B,G]
    # broadcast group stats back to channels: [B,G] -> [B,C]
    B = x.shape[0]
    inv_c = jnp.repeat(inv_g, C // G, axis=-1)
    mean_c = jnp.repeat(mean_g, C // G, axis=-1)
    a = inv_c * scale[None]                             # [B,C]
    b = bias[None] - mean_c * a
    bshape = (B,) + (1,) * (x.ndim - 2) + (C,)
    y = x.astype(jnp.float32) * a.reshape(bshape) + b.reshape(bshape)
    return y.astype(x.dtype)
