"""Image / LiDAR conv encoders — TPU-native RegNetY.

The reference pulls `regnety_032` from TIMM for both branches
(transfuser.py:25-58, config.py:200-201). Re-implemented here in flax,
channels-last (NHWC) so convolutions tile straight onto the MXU, with
GroupNorm by default instead of BatchNorm (no cross-device stat syncing —
the TPU-idiomatic swap noted in SURVEY.md §2.8).

For torch-checkpoint drop-in, norm="bn_affine" replaces each GroupNorm
with an AffineNorm carrying the FOLDED inference BatchNorm
(scale = gamma/sqrt(var+eps), bias = beta - mean*scale — see
convert/torch_import.batchnorm_scale_bias). This reproduces the
reference's eval-mode numerics exactly without running statistics;
training new models stays on GroupNorm.

RegNetY-032 spec (timm): stem 32, stages depth (2, 5, 13, 1), widths
(72, 216, 576, 1512), group width 24, SE ratio 0.25, stride 2 per stage.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

REGNETY_032 = dict(depths=(2, 5, 13, 1), widths=(72, 216, 576, 1512),
                   group_w=24, se_ratio=0.25, stem_w=32)
# A small config for tests / fast iteration
REGNETY_MICRO = dict(depths=(1, 1, 2, 1), widths=(32, 64, 128, 256),
                     group_w=16, se_ratio=0.25, stem_w=16)


class AffineNorm(nn.Module):
  """Per-channel affine: inference-mode BatchNorm with folded statistics."""

  @nn.compact
  def __call__(self, x):
    c = x.shape[-1]
    scale = self.param("scale", nn.initializers.ones, (c,))
    bias = self.param("bias", nn.initializers.zeros, (c,))
    return x * scale + bias


def make_norm(norm: str, width: int, name: str):
  if norm == "bn_affine":
    return AffineNorm(name=name)
  # largest divisor of width <= 32 (regnety_032 widths 72/216/1512 are not
  # multiples of 32; micro widths keep their previous min(32, width) groups)
  g = min(32, width)
  while width % g:
    g -= 1
  # layout-preserving GroupNorm: flax's group reshape was ~70% of the
  # full-spec forward's device time (ops/norm.py docstring, r4 XProf)
  from carla_garage_tpu.ops.norm import TpuGroupNorm
  return TpuGroupNorm(num_groups=g, name=name)


class SqueezeExcite(nn.Module):
  rd_channels: int

  @nn.compact
  def __call__(self, x):
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = nn.Conv(self.rd_channels, (1, 1), name="fc1")(s)
    s = nn.relu(s)
    s = nn.Conv(x.shape[-1], (1, 1), name="fc2")(s)
    return x * nn.sigmoid(s)


class YBlock(nn.Module):
  """RegNetY bottleneck block: 1x1 → 3x3 grouped (stride) → SE → 1x1 + skip."""
  width: int
  stride: int
  group_w: int
  se_ratio: float
  norm: str = "gn"

  @nn.compact
  def __call__(self, x):
    w_in = x.shape[-1]
    groups = max(self.width // self.group_w, 1)
    h = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
    h = make_norm(self.norm, self.width, "norm1")(h)
    h = nn.relu(h)
    # explicit torch-style padding: flax SAME pads (0,1) for stride-2 3x3,
    # torch Conv2d(padding=1) pads (1,1) — they only agree at stride 1
    h = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)),
                feature_group_count=groups, use_bias=False, name="conv2")(h)
    h = make_norm(self.norm, self.width, "norm2")(h)
    h = nn.relu(h)
    h = SqueezeExcite(max(int(w_in * self.se_ratio), 8), name="se")(h)
    h = nn.Conv(self.width, (1, 1), use_bias=False, name="conv3")(h)
    h = make_norm(self.norm, self.width, "norm3")(h)
    if self.stride != 1 or w_in != self.width:
      x = nn.Conv(self.width, (1, 1), strides=(self.stride, self.stride),
                  use_bias=False, name="down_conv")(x)
      x = make_norm(self.norm, self.width, "down_norm")(x)
    return nn.relu(x + h)


class RegNetYStem(nn.Module):
  stem_w: int
  norm: str = "gn"

  @nn.compact
  def __call__(self, x):
    h = nn.Conv(self.stem_w, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), use_bias=False, name="conv")(x)
    h = make_norm(self.norm, self.stem_w, "norm")(h)
    return nn.relu(h)


class RegNetYStage(nn.Module):
  depth: int
  width: int
  group_w: int
  se_ratio: float
  norm: str = "gn"

  @nn.compact
  def __call__(self, x):
    for bi in range(self.depth):
      x = YBlock(self.width, 2 if bi == 0 else 1, self.group_w,
                 self.se_ratio, norm=self.norm, name=f"b{bi}")(x)
    return x


class RegNetY(nn.Module):
  """Returns the 4 stage feature maps (strides 4, 8, 16, 32 w.r.t. input)."""
  depths: Sequence[int] = REGNETY_032["depths"]
  widths: Sequence[int] = REGNETY_032["widths"]
  group_w: int = REGNETY_032["group_w"]
  se_ratio: float = REGNETY_032["se_ratio"]
  stem_w: int = REGNETY_032["stem_w"]
  norm: str = "gn"

  @nn.compact
  def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
    h = RegNetYStem(self.stem_w, norm=self.norm, name="stem")(x)
    feats = []
    for si, (d, w) in enumerate(zip(self.depths, self.widths)):
      h = RegNetYStage(d, w, self.group_w, self.se_ratio, norm=self.norm,
                       name=f"stage{si}")(h)
      feats.append(h)
    return tuple(feats)


ARCHS = {"regnety_032": REGNETY_032, "regnety_micro": REGNETY_MICRO}


def arch_spec(arch: str) -> dict:
  if arch not in ARCHS:
    raise ValueError(f"unknown arch {arch}")
  return ARCHS[arch]


def make_encoder(arch: str = "regnety_032") -> RegNetY:
  return RegNetY(**arch_spec(arch))
