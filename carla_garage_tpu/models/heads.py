"""Prediction heads: perspective/BEV decoders, CenterNet, waypoint GRUs.

Re-designs of the reference heads in flax/NHWC:
  PerspectiveDecoder   transfuser_utils.py:668-705 (semantic + depth)
  BEV semantic decoder model.py:74-101
  LidarCenterNetHead   center_net.py:12-237
  GRU waypoint heads   model.py:839-913
  PositionEmbeddingSine model.py:916-953
  Transformer-decoder join model.py:121-182, :299-369
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class PerspectiveDecoder(nn.Module):
  """Two deconv-style upsampling stages ending at a per-pixel map
  (transfuser_utils.PerspectiveDecoder)."""
  out_channels: int
  inter_channel_0: int = 128
  inter_channel_1: int = 64
  inter_channel_2: int = 32
  scale_factor_0: int = 4
  scale_factor_1: int = 8

  @nn.compact
  def __call__(self, x):
    """x is the stride-32 image feature map; output is full resolution
    (scale_factor_0 * scale_factor_1 = 32 cumulative upsampling)."""
    B, H, W, _ = x.shape
    h = nn.Conv(self.inter_channel_0, (3, 3), name="deconv1_0")(x)
    h = nn.relu(h)
    h = nn.Conv(self.inter_channel_1, (3, 3), name="deconv1_1")(h)
    h = nn.relu(h)
    H1, W1 = H * self.scale_factor_0, W * self.scale_factor_0
    h = jax.image.resize(h, (B, H1, W1, self.inter_channel_1),
                         method="bilinear")
    h = nn.Conv(self.inter_channel_2, (3, 3), name="deconv2_0")(h)
    h = nn.relu(h)
    h = nn.Conv(self.inter_channel_2, (3, 3), name="deconv2_1")(h)
    h = nn.relu(h)
    H2, W2 = H1 * self.scale_factor_1, W1 * self.scale_factor_1
    h = jax.image.resize(h, (B, H2, W2, self.inter_channel_2),
                         method="bilinear")
    h = nn.Conv(self.inter_channel_2, (3, 3), name="deconv3_0")(h)
    h = nn.relu(h)
    return nn.Conv(self.out_channels, (3, 3), name="deconv3_1")(h)


class CenterNetHead(nn.Module):
  """Per-pixel detection heads over the BEV feature grid
  (center_net.py:20-75): heatmap, wh, offset, yaw class+residual, velocity,
  brake."""
  num_classes: int = 4
  feat_channels: int = 64
  num_dir_bins: int = 12

  def _branch(self, x, out, name, bias_init=0.0):
    h = nn.Conv(self.feat_channels, (3, 3), name=f"{name}_conv")(x)
    h = nn.relu(h)
    return nn.Conv(out, (1, 1), name=f"{name}_out",
                   bias_init=nn.initializers.constant(bias_init))(h)

  @nn.compact
  def __call__(self, x):
    # heatmap bias init so initial p ~ 0.1 (center_net bias_init_with_prob)
    import math
    prior = -math.log((1 - 0.1) / 0.1)
    return {
        "heatmap": self._branch(x, self.num_classes, "heatmap", prior),
        "wh": self._branch(x, 2, "wh"),
        "offset": self._branch(x, 2, "offset"),
        "yaw_class": self._branch(x, self.num_dir_bins, "yaw_class"),
        "yaw_res": self._branch(x, 1, "yaw_res"),
        "velocity": self._branch(x, 1, "velocity"),
        "brake": self._branch(x, 2, "brake"),
    }


class GRUWaypointsPredictorTransFuser(nn.Module):
  """Autoregressive GRUCell waypoint decoder (model.py:870-913): each step
  feeds the current waypoint + target point; outputs cumulative deltas."""
  pred_len: int
  hidden_size: int = 64
  target_point_size: int = 2

  @nn.compact
  def __call__(self, z, target_point):
    """z [B,hidden] context; target_point [B,2] -> waypoints [B,pred_len,2]."""
    B = z.shape[0]
    cell = nn.GRUCell(features=self.hidden_size, name="gru")
    out_proj = nn.Dense(2, name="decoder")
    carry = z
    x = jnp.zeros((B, 2))
    wps = []
    for _ in range(self.pred_len):
      inp = jnp.concatenate([x, target_point], -1)
      carry, _ = cell(carry, inp)
      dx = out_proj(carry)
      x = x + dx
      wps.append(x)
    return jnp.stack(wps, 1)


class GRUWaypointsPredictorInterFuser(nn.Module):
  """Parallel GRU over query tokens + cumsum (model.py:839-867)."""
  pred_len: int
  hidden_size: int = 64

  @nn.compact
  def __call__(self, tokens, target_point):
    """tokens [B,pred_len,C], target_point [B,2] -> [B,pred_len,2]."""
    B = tokens.shape[0]
    tp = nn.Dense(tokens.shape[-1], name="encoder")(target_point)
    x = tokens + tp[:, None]
    gru = nn.RNN(nn.GRUCell(features=self.hidden_size), name="gru")
    h = gru(x)
    deltas = nn.Dense(2, name="decoder")(h)
    return jnp.cumsum(deltas, axis=1)


def sine_position_embedding(h: int, w: int, channels: int,
                            temperature: float = 10000.0) -> jnp.ndarray:
  """2D sine positional encoding [h*w, channels] (model.py:916-953)."""
  n = channels // 2
  ys = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1) + 1.0
  xs = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0) + 1.0
  ys = ys / (h + 1e-6) * 2 * jnp.pi
  xs = xs / (w + 1e-6) * 2 * jnp.pi
  dim_t = temperature ** (2 * (jnp.arange(n) // 2) / n)
  py = ys[..., None] / dim_t
  px = xs[..., None] / dim_t
  py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                 -1).reshape(h, w, -1)
  px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                 -1).reshape(h, w, -1)
  return jnp.concatenate([py, px], -1).reshape(h * w, channels)


class TransformerDecoderLayer(nn.Module):
  d_model: int
  n_head: int
  dim_ff: int = 2048

  @nn.compact
  def __call__(self, tgt, memory, deterministic=True):
    h = nn.LayerNorm(name="ln1")(tgt)
    tgt = tgt + nn.MultiHeadDotProductAttention(
        num_heads=self.n_head, name="self_attn")(h, h,
                                                 deterministic=deterministic)
    h = nn.LayerNorm(name="ln2")(tgt)
    tgt = tgt + nn.MultiHeadDotProductAttention(
        num_heads=self.n_head, name="cross_attn")(
        h, memory, deterministic=deterministic)
    h = nn.LayerNorm(name="ln3")(tgt)
    h = nn.Dense(self.dim_ff, name="ff1")(h)
    h = nn.relu(h)
    h = nn.Dense(self.d_model, name="ff2")(h)
    return tgt + h


class TransformerDecoderJoin(nn.Module):
  """Learned query tokens cross-attend into the fused BEV memory
  (model.py:121-182): queries = waypoint/checkpoint slots + target-speed
  slot; memory = flattened BEV features + extra-sensor token."""
  d_model: int = 256
  n_head: int = 8
  n_layers: int = 6
  num_queries: int = 11      # pred_len checkpoints + 1 target-speed token

  @nn.compact
  def __call__(self, memory, deterministic=True):
    B = memory.shape[0]
    queries = self.param("queries", nn.initializers.normal(0.02),
                         (1, self.num_queries, self.d_model))
    tgt = jnp.broadcast_to(queries, (B, self.num_queries, self.d_model))
    for i in range(self.n_layers):
      tgt = TransformerDecoderLayer(self.d_model, self.n_head,
                                    name=f"layer{i}")(tgt, memory,
                                                      deterministic)
    return nn.LayerNorm(name="ln_f")(tgt)
