"""Vectorized NPC traffic policy — the TrafficManager replacement.

The reference drives background traffic with CARLA's C++ TrafficManager
(route_scenario_local.py:445-494). Behavioral equivalent here: every NPC
follows a lane polyline (pure-pursuit steering), keeps IDM-style spacing from
the nearest leader (any vehicle, the ego, or an active walker), and stops at
red lights whose stop-line trigger it approaches. All [B,V] masked array ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.maps.town_map import LaneGraph
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.sim.dynamics import bicycle_step
from carla_garage_tpu.structs import LightState, Scene, SimState, VehicleStates

NPC_TARGET_SPEED = 5.0     # m/s ~ TM default (30 km/h limit minus offset)
LOOKAHEAD_M = 5.0
STEER_GAIN = 2.0
SAFE_TIME_HEADWAY = 1.6    # IDM
SAFE_MIN_GAP = 4.0
LIGHT_STOP_DIST = 5.0


def traffic_step(cfg: GlobalConfig, lanes: LaneGraph, scene: Scene,
                 state: SimState, effects: dict | None = None
                 ) -> VehicleStates:
  """Advance all NPC vehicles one tick. `effects` carries scenario
  overrides (sim/scenarios.py): forced braking and speed caps per slot."""
  s = cfg.sim
  veh = state.vehicles
  B, V = veh.yaw.shape

  # --- steering: pure pursuit toward a point LOOKAHEAD_M ahead on the lane ---
  t_ahead = veh.lane_t + LOOKAHEAD_M
  target, _ = lanes.position_at(veh.lane_id, t_ahead)
  ang = geo.angle_to_target_deg(veh.pos, veh.yaw, target) / 90.0
  steer = jnp.clip(STEER_GAIN * ang, -1.0, 1.0)

  # --- leader gap: nearest agent ahead in our corridor ---
  def gap_to(others_pos, others_valid):
    # others_pos broadcastable to [B,V,N,2]; others_valid to [B,V,N]
    rel = geo.world_to_ego(others_pos, veh.pos[:, :, None],
                           veh.yaw[:, :, None])          # [B,V,N,2]
    ahead = (rel[..., 0] > 0.0) & (jnp.abs(rel[..., 1]) < 2.0)
    d = jnp.where(ahead & others_valid, rel[..., 0], jnp.inf)
    return jnp.min(d, -1)

  not_self = ~jnp.eye(V, dtype=bool)[None]
  gap_veh = gap_to(veh.pos[:, None, :, :], veh.valid[:, None] & not_self)
  gap_ego = gap_to(state.ego.pos[:, None, None, :],
                   jnp.ones((B, 1, 1), bool))
  wlk = state.walkers
  gap_wlk = gap_to(wlk.pos[:, None, :, :],
                   (wlk.valid & wlk.active)[:, None])
  gap = jnp.minimum(jnp.minimum(gap_veh, gap_ego), gap_wlk)

  # --- red light: stop if an affecting stop-line is close ahead and red ---
  lights = scene.lights
  lstate = lights.state_at(state.time_s)                 # [B,L]
  rel_l = geo.world_to_ego(lights.pos[:, None], veh.pos[:, :, None],
                           veh.yaw[:, :, None])          # [B,V,L,2]
  ahead_l = (rel_l[..., 0] > 0.0) & (rel_l[..., 0] < LIGHT_STOP_DIST) & \
            (jnp.abs(rel_l[..., 1]) < 2.0)
  # only the light facing us (trigger yaw ~ our yaw)
  facing = jnp.abs(geo.normalize_angle(
      lights.yaw[:, None] - veh.yaw[:, :, None])) < 0.5
  red = (lstate == LightState.RED) | (lstate == LightState.YELLOW)
  light_block = jnp.any(ahead_l & facing & red[:, None] &
                        lights.valid[:, None], -1)

  # --- IDM-style longitudinal control; slow near lane ends (U-turns) ---
  total_here = lanes.total_len[veh.lane_id]
  near_end = (total_here - veh.lane_t) < 12.0
  dead_end = lanes.successor[veh.lane_id, 0] < 0
  target_speed = jnp.where(near_end, 2.0, NPC_TARGET_SPEED)
  if effects is not None:
    target_speed = jnp.minimum(target_speed, effects["npc_speed_cap"])
  desired_gap = SAFE_MIN_GAP + veh.speed * SAFE_TIME_HEADWAY
  # dead-end lanes: slow down (near_end cap) and drive to the end, where
  # the despawn below removes the vehicle — braking to a stop here would
  # park a permanent roadblock on the lane
  brake = (gap < desired_gap) | light_block | \
      (veh.speed > target_speed + 0.5)
  if effects is not None:
    brake = brake | effects["npc_brake_override"]
  throttle = jnp.where(veh.speed < target_speed, 0.6, 0.0)
  throttle = jnp.where(brake, 0.0, throttle)

  pos, yaw, speed = bicycle_step(veh.pos, veh.yaw, veh.speed, steer,
                                 throttle, brake.astype(jnp.float32), s)
  yaw = geo.normalize_angle(yaw)
  pos = jnp.where(veh.valid[..., None], pos, veh.pos)
  yaw = jnp.where(veh.valid, yaw, veh.yaw)
  speed = jnp.where(veh.valid, speed, 0.0)

  # --- lane progress + successor hand-off; despawn at dead ends and on
  # long standstill (anti-deadlock — CARLA's TrafficManager also recycles
  # stuck vehicles; 40 s >> any legitimate red-light wait) ---
  lane_t = veh.lane_t + speed * s.dt
  total = lanes.total_len[veh.lane_id]
  nxt = lanes.successor[veh.lane_id, 0]
  wrap = (lane_t >= total) & (nxt >= 0)
  stand = jnp.where(speed < 0.05, veh.stand_ticks + 1, 0).astype(jnp.int32)
  deadlocked = stand > 800
  if effects is not None and "npc_speed_cap" in effects:
    deadlocked &= effects["npc_speed_cap"] > 0.01    # scenario-held exempt
  despawn = ((lane_t >= total - 1.0) & (nxt < 0)) | deadlocked
  valid = veh.valid & ~despawn
  lane_id = jnp.where(wrap, nxt, veh.lane_id)
  lane_t = jnp.where(wrap, lane_t - total, jnp.minimum(lane_t, total))

  # --- stuck-detection ring buffers (autopilot.py:572-581) ---
  def push(buf, v):
    return jnp.concatenate([buf[..., 1:], v[..., None]], -1)

  return veh.replace(
      pos=pos, yaw=yaw, speed=speed, valid=valid,
      control=jnp.stack([steer, throttle, brake.astype(jnp.float32)], -1),
      buf_vel=push(veh.buf_vel, speed),
      buf_throttle=push(veh.buf_throttle, throttle),
      buf_brake=push(veh.buf_brake, brake.astype(jnp.float32)),
      lane_id=lane_id.astype(jnp.int32), lane_t=lane_t,
      stand_ticks=stand)


def walker_step(cfg: GlobalConfig, scene: Scene, state: SimState):
  """Crossing-walker scenario dynamics (DynamicObjectCrossing semantics)."""
  s = cfg.sim
  wlk = state.walkers
  spec = scene.walkers_spec
  d_ego = jnp.linalg.norm(wlk.pos - state.ego.pos[:, None], axis=-1)
  trigger = wlk.valid & (d_ego < spec.trigger_dist)
  active = wlk.active | trigger
  walking = active & (wlk.walked_m < spec.cross_dist) & wlk.valid
  speed = jnp.where(walking, spec.walk_speed, 0.0)
  pos = wlk.pos + wlk.direction * (speed * s.dt)[..., None]
  walked = wlk.walked_m + speed * s.dt
  # the crossing scenario destroys its walker once the cross completes
  # (object_crash_vehicle.py behavior-tree end) — otherwise it would stand
  # in the road and block traffic forever
  finished = active & (walked >= spec.cross_dist)
  valid = wlk.valid & ~finished
  in_radius = valid & (d_ego < cfg.expert.detection_radius)
  seen = wlk.seen_frames + in_radius.astype(jnp.int32)
  return wlk.replace(pos=pos, speed=speed, active=active, walked_m=walked,
                     seen_frames=seen, valid=valid)
