"""PlanT — object-level transformer planner in flax.

Re-design of team_code/plant.py:26-574: a BERT-style encoder over
[CLS] + object tokens (vehicles / route segments, each a quantized
attribute vector with a type embedding) + output heads (waypoint GRU,
target-speed classifier, checkpoint GRU, per-attribute forecast heads).

The reference instantiates HuggingFace `prajjwal1/bert-medium`
(config.py:538: 8 layers, 512 hidden, 8 heads). Here the encoder is a plain
pre-LN transformer with the same dimensions — no HF dependency on the
device path.

Token attributes (config.py:536): x, y, extent_x, extent_y, yaw, speed,
brake (+ object type: 0 vehicle, 1 walker, 2 light, 3 stop, 4 route).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from carla_garage_tpu.models.heads import GRUWaypointsPredictorTransFuser


@dataclasses.dataclass(frozen=True)
class PlanTConfig:
  hidden: int = 512          # bert-medium
  n_layers: int = 8
  n_heads: int = 8
  num_attributes: int = 7    # plant_num_attributes
  num_types: int = 6         # plant_object_types
  max_tokens: int = 64       # object slots + route slots + CLS
  pred_len: int = 8
  checkpoint_len: int = 10
  target_speed_bins: int = 4
  gru_hidden: int = 64
  # quantization precisions (config.py:531-534)
  precision_pos: int = 7
  precision_angle: int = 4
  precision_speed: int = 5
  precision_brake: int = 2
  forecast_time: float = 0.5


def micro_plant() -> PlanTConfig:
  return PlanTConfig(hidden=64, n_layers=2, n_heads=2, max_tokens=16)


class EncoderBlock(nn.Module):
  hidden: int
  n_heads: int

  @nn.compact
  def __call__(self, x, mask=None, deterministic=True):
    h = nn.LayerNorm(name="ln1")(x)
    x = x + nn.MultiHeadDotProductAttention(
        num_heads=self.n_heads, name="attn")(h, h, mask=mask,
                                             deterministic=deterministic)
    h = nn.LayerNorm(name="ln2")(x)
    h = nn.Dense(4 * self.hidden, name="ff1")(h)
    h = nn.gelu(h)
    h = nn.Dense(self.hidden, name="ff2")(h)
    return x + h


class PlanT(nn.Module):
  cfg: PlanTConfig

  @nn.compact
  def __call__(self, tokens, token_types, token_valid, target_point,
               deterministic=True):
    """tokens [B,T,A] continuous attributes, token_types [B,T] int,
    token_valid [B,T] bool, target_point [B,2].

    Returns dict: pred_wp [B,pred_len,2], pred_target_speed [B,bins],
    pred_checkpoint [B,ckpt,2], pred_forecast (per-attribute logits over
    quantization bins for each object token).
    """
    c = self.cfg
    B, T, _ = tokens.shape
    emb = nn.Dense(c.hidden, name="attr_emb")(tokens)
    emb = emb + nn.Embed(c.num_types, c.hidden, name="type_emb")(token_types)
    cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, c.hidden))
    x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.hidden)), emb], 1)
    valid = jnp.concatenate([jnp.ones((B, 1), bool), token_valid], 1)
    mask = valid[:, None, None, :] & valid[:, None, :, None]
    for i in range(c.n_layers):
      x = EncoderBlock(c.hidden, c.n_heads, name=f"layer{i}")(
          x, mask, deterministic)
    x = nn.LayerNorm(name="ln_f")(x)
    cls_out, obj_out = x[:, 0], x[:, 1:]

    out = {}
    z = nn.Dense(c.gru_hidden, name="wp_proj")(cls_out)
    out["pred_wp"] = GRUWaypointsPredictorTransFuser(
        c.pred_len, c.gru_hidden, name="wp_gru")(z, target_point)
    out["pred_target_speed"] = nn.Dense(
        c.target_speed_bins, name="target_speed_head")(cls_out)
    zc = nn.Dense(c.gru_hidden, name="ckpt_proj")(cls_out)
    out["pred_checkpoint"] = GRUWaypointsPredictorTransFuser(
        c.checkpoint_len, c.gru_hidden, name="checkpoint_gru")(
        zc, target_point)
    # forecasting heads: quantized attribute classification per object token
    # (plant.py:201-309)
    out["pred_forecast"] = {
        "x": nn.Dense(2 ** c.precision_pos, name="fc_x")(obj_out),
        "y": nn.Dense(2 ** c.precision_pos, name="fc_y")(obj_out),
        "yaw": nn.Dense(2 ** c.precision_angle, name="fc_yaw")(obj_out),
        "speed": nn.Dense(2 ** c.precision_speed, name="fc_speed")(obj_out),
        "brake": nn.Dense(2 ** c.precision_brake, name="fc_brake")(obj_out),
    }
    return out
