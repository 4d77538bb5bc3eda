"""PlanT — object-level transformer planner in flax.

Exact-architecture mirror of team_code/plant.py:26-343 so converted torch
checkpoints drop in:
  * tokens = [CLS] + object boxes (7 attrs: x, y, extent_x, extent_y, yaw,
    speed, brake) + route points as pseudo-boxes ([x, y, 0...], :207-215);
  * per-type embedding = tok_emb(attrs) + obj_emb[type](obj_token[type])
    (the per-type masked sum :226-250 collapses to a type-indexed bias
    because the type masks are disjoint and complete);
  * encoder = BERT (bert-medium: 8 layers, 512 hidden, 8 heads) via the
    exact HF mirror in models/bert.py — inputs_embeds + position
    embeddings, NO attention mask (the reference passes none; padded
    tokens are zero-attribute "other"-type rows);
  * forecast = 7 per-attribute quantized-classification heads over the
    object token outputs (:264-269);
  * waypoints = wp_head on [CLS ; velocity branch] -> (z, learned origin),
    autoregressive GRUCell whose per-step input is [x, light_hazard,
    stop_hazard, junction] (:276-301) — the hazard FLAGS, not the target
    point;
  * target speed = Linear+ReLU+Linear on [CLS ; vel ; flags] (:305-306);
  * checkpoints = InterFuser GRU over the ROUTE token outputs with no
    target-point hidden init (:75-79, :308).

The target point is NOT a network input (only the PID controllers use it,
plant.py:345-438).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from carla_garage_tpu.models.bert import BertEncoder
from carla_garage_tpu.models.heads import GRUWaypointsPredictorInterFuser


class ObjType:
  """Token type codes (plant.py:219-231 mask order)."""
  VEHICLE = 0
  WALKER = 1
  LIGHT = 2
  STOP = 3
  ROUTE = 4
  OTHER = 5    # CLS + padding


@dataclasses.dataclass(frozen=True)
class PlanTConfig:
  hidden: int = 512          # bert-medium
  n_layers: int = 8
  n_heads: int = 8
  intermediate: int = 2048
  max_positions: int = 512   # BERT position-embedding table size
  num_attributes: int = 7    # plant_num_attributes
  num_types: int = 6         # plant_object_types
  max_objects: int = 30      # vehicle/walker/light/stop token slots
  num_route_points: int = 20 # route tokens = predicted checkpoints
  pred_len: int = 8
  target_speed_bins: int = 4
  gru_hidden: int = 64
  use_velocity: bool = True
  learn_origin: bool = True
  # quantization precisions per attribute (x, y, ex, ey, yaw, speed, brake)
  precision_pos: int = 7
  precision_angle: int = 4
  precision_speed: int = 5
  precision_brake: int = 2
  forecast_time: float = 0.5

  @property
  def vocab_sizes(self):
    p = (self.precision_pos,) * 4 + (self.precision_angle,
                                     self.precision_speed,
                                     self.precision_brake)
    return tuple(2 ** x for x in p)

  @property
  def max_tokens(self):
    return 1 + self.max_objects + self.num_route_points


def micro_plant() -> PlanTConfig:
  return PlanTConfig(hidden=64, n_layers=2, n_heads=2, intermediate=256,
                     max_positions=64, max_objects=10, num_route_points=6)


class PlanT(nn.Module):
  cfg: PlanTConfig

  @nn.compact
  def __call__(self, boxes, box_types, route, light_hazard, stop_hazard,
               junction, velocity, deterministic=True):
    """boxes [B,O,7] ego-frame attributes (padded rows zero),
    box_types [B,O] int (ObjType; padding = OTHER), route [B,R,2]
    ego-frame route points, light/stop/junction [B] float flags,
    velocity [B] m/s.

    Returns dict: pred_wp [B,pred_len,2], pred_target_speed [B,bins],
    pred_checkpoint [B,R,2], pred_forecast tuple of 7 per-attribute
    logits [B,O,vocab_i]."""
    c = self.cfg
    B, O, A = boxes.shape
    R = route.shape[1]

    # token assembly (plant.py:207-215)
    route_attrs = jnp.concatenate(
        [route, jnp.zeros((B, R, A - 2))], -1)
    cls_emb = self.param("cls_emb", nn.initializers.normal(1.0),
                         (1, A + 1))
    cls_attrs = jnp.broadcast_to(cls_emb[None, :, :A], (B, 1, A))
    attrs = jnp.concatenate([cls_attrs, boxes, route_attrs], 1)
    types = jnp.concatenate([
        jnp.full((B, 1), ObjType.OTHER, jnp.int32),
        box_types.astype(jnp.int32),
        jnp.full((B, R), ObjType.ROUTE, jnp.int32)], 1)

    emb = nn.Dense(c.hidden, name="tok_emb")(attrs)
    # per-type bias: obj_emb[i](obj_token[i]) (plant.py:226-250)
    type_bias = []
    for i in range(c.num_types):
      tok = self.param(f"obj_token{i}", nn.initializers.normal(1.0),
                       (1, A))
      type_bias.append(nn.Dense(c.hidden, name=f"obj_emb{i}")(tok)[0])
    type_bias = jnp.stack(type_bias)                      # [types, hidden]
    emb = emb + type_bias[types]

    x = BertEncoder(c.hidden, c.n_layers, c.n_heads, c.intermediate,
                    max_positions=c.max_positions,
                    name="bert")(emb, deterministic)
    cls_f = x[:, 0]
    obj_f = x[:, 1:1 + O]
    route_f = x[:, 1 + O:1 + O + R]

    out = {}
    out["pred_forecast"] = tuple(
        nn.Dense(v, name=f"forecast_head{i}")(obj_f)
        for i, v in enumerate(c.vocab_sizes))

    if c.use_velocity:
      from carla_garage_tpu.models.backbones import AffineNorm
      vn = AffineNorm(name="velocity_norm")(velocity[:, None])
      ve = nn.relu(nn.Dense(128, name="vel_fc1")(vn))
      ve = nn.relu(nn.Dense(128, name="vel_fc2")(ve))
      cls_f = jnp.concatenate([cls_f, ve], -1)

    flags = jnp.stack([light_hazard, stop_hazard, junction],
                      -1).astype(jnp.float32)             # [B,3]

    # waypoint GRU (plant.py:276-301)
    z = nn.Dense(64 + (2 if c.learn_origin else 0), name="wp_head")(cls_f)
    if c.learn_origin:
      xw = z[:, 64:66]
      z = z[:, :64]
    else:
      xw = jnp.zeros((B, 2))
    cell = nn.GRUCell(features=64, name="wp_gru")
    wp_out = nn.Dense(2, name="wp_output")
    wps = []
    for _ in range(c.pred_len):
      x_in = jnp.concatenate([xw, flags], -1)
      z, _ = cell(z, x_in)
      xw = xw + wp_out(z)
      wps.append(xw)
    out["pred_wp"] = jnp.stack(wps, 1)

    # target speed (plant.py:305-306)
    ts_in = jnp.concatenate([cls_f, flags], -1)
    h = nn.relu(nn.Dense(128, name="target_speed_fc1")(ts_in))
    out["pred_target_speed"] = nn.Dense(
        c.target_speed_bins, name="target_speed_head")(h)

    # checkpoints from route tokens (plant.py:75-79, :308)
    out["pred_checkpoint"] = GRUWaypointsPredictorInterFuser(
        R, c.gru_hidden, target_point_size=0,
        name="checkpoint_decoder")(route_f, None)
    return out
