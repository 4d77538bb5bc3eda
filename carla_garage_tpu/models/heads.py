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
  # model.py:65-72: scale_factor_0 = upsample(32) // deconv_scale_factor_0(4)
  # = 8, scale_factor_1 = 32 // deconv_scale_factor_1(8) = 4 — x8 then x4
  scale_factor_0: int = 8
  scale_factor_1: int = 4

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
  # the reference only builds velocity/brake branches for temporal configs
  # (center_net.py:67-72: seq lens != 1); pretrained TF++ drop-ins lack them
  with_velocity_brake: bool = True

  def _branch(self, x, out, name, bias_init=0.0):
    # hidden width = input width (center_net._build_head: Conv(in, in, 3))
    h = nn.Conv(x.shape[-1], (3, 3), name=f"{name}_conv")(x)
    h = nn.relu(h)
    return nn.Conv(out, (1, 1), name=f"{name}_out",
                   bias_init=nn.initializers.constant(bias_init))(h)

  @nn.compact
  def __call__(self, x):
    # heatmap bias init so initial p ~ 0.1 (center_net bias_init_with_prob)
    import math
    prior = -math.log((1 - 0.1) / 0.1)
    out = {
        "heatmap": self._branch(x, self.num_classes, "heatmap", prior),
        "wh": self._branch(x, 2, "wh"),
        "offset": self._branch(x, 2, "offset"),
        "yaw_class": self._branch(x, self.num_dir_bins, "yaw_class"),
        "yaw_res": self._branch(x, 1, "yaw_res"),
    }
    if self.with_velocity_brake:
      out["velocity"] = self._branch(x, 1, "velocity")
      out["brake"] = self._branch(x, 2, "brake")
    return out


class GRUWaypointsPredictorTransFuser(nn.Module):
  """Autoregressive GRUCell waypoint decoder (model.py:870-913): each step
  feeds the current waypoint + target point; outputs cumulative deltas.
  With learn_origin the context carries the waypoint origin in its last two
  features (model.py:889-893, config.learn_origin=1 in TF++)."""
  pred_len: int
  hidden_size: int = 64
  target_point_size: int = 2
  learn_origin: bool = False

  @nn.compact
  def __call__(self, z, target_point):
    """z [B,hidden(+2 if learn_origin)]; target_point [B,2] ->
    waypoints [B,pred_len,2]."""
    B = z.shape[0]
    cell = nn.GRUCell(features=self.hidden_size, name="gru")
    out_proj = nn.Dense(2, name="decoder")
    if self.learn_origin:
      x = z[:, self.hidden_size:self.hidden_size + 2]
      carry = z[:, :self.hidden_size]
    else:
      x = jnp.zeros((B, 2))
      carry = z
    wps = []
    for _ in range(self.pred_len):
      inp = jnp.concatenate([x, target_point], -1) \
          if self.target_point_size > 0 else x
      carry, _ = cell(carry, inp)
      dx = out_proj(carry)
      x = x + dx
      wps.append(x)
    return jnp.stack(wps, 1)


class GRUWaypointsPredictorInterFuser(nn.Module):
  """GRU over query tokens with the target-point embedding as the INITIAL
  HIDDEN state, then per-step decode + cumsum (model.py:839-867)."""
  pred_len: int
  hidden_size: int = 64
  target_point_size: int = 2

  @nn.compact
  def __call__(self, tokens, target_point):
    """tokens [B,pred_len,C], target_point [B,2] -> [B,pred_len,2]."""
    # tiny head: run in fp32 even under a bf16 backbone (the scan carry
    # must be dtype-stable, and mixed promotion inside GRUCell breaks it)
    tokens = tokens.astype(jnp.float32)
    B = tokens.shape[0]
    if self.target_point_size > 0:
      h0 = nn.Dense(self.hidden_size, name="encoder")(
          target_point.astype(jnp.float32))
    else:
      h0 = jnp.zeros((B, self.hidden_size))
    h0 = h0.astype(jnp.float32)
    gru = nn.RNN(nn.GRUCell(features=self.hidden_size, name="gru"),
                 return_carry=False)
    h = gru(tokens, initial_carry=h0)
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
  """POST-LN decoder layer — exactly torch's nn.TransformerDecoderLayer
  (norm_first=False, dim_feedforward=2048) as constructed in
  model.py:138-144, so converted checkpoints are drop-in.

  Activation is RELU, not the GELU the reference requests: torch's
  nn.TransformerDecoder deep-copies the layer and TransformerDecoderLayer.
  __setstate__ resets any module-type activation (which lives in _modules,
  not __dict__) to F.relu — verified empirically against torch 1.12/2.13,
  so the reference's trained decoders actually ran relu."""
  d_model: int
  n_head: int
  dim_ff: int = 2048
  activation: str = "relu"

  @nn.compact
  def __call__(self, tgt, memory, deterministic=True):
    h = nn.MultiHeadDotProductAttention(
        num_heads=self.n_head, name="self_attn")(
        tgt, tgt, deterministic=deterministic)
    tgt = nn.LayerNorm(epsilon=1e-5, name="ln1")(tgt + h)
    h = nn.MultiHeadDotProductAttention(
        num_heads=self.n_head, name="cross_attn")(
        tgt, memory, deterministic=deterministic)
    tgt = nn.LayerNorm(epsilon=1e-5, name="ln2")(tgt + h)
    h = nn.Dense(self.dim_ff, name="ff1")(tgt)
    h = nn.relu(h) if self.activation == "relu" else \
        nn.gelu(h, approximate=False)
    h = nn.Dense(self.d_model, name="ff2")(h)
    return nn.LayerNorm(epsilon=1e-5, name="ln3")(tgt + h)


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
    return nn.LayerNorm(epsilon=1e-5, name="ln_f")(tgt)
