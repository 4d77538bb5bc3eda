"""Vectorized NPC traffic policy — the TrafficManager replacement.

The reference drives background traffic with CARLA's C++ TrafficManager
(route_scenario_local.py:445-494). Behavioral equivalent here: every NPC
follows a directed lane polyline of the town lane graph EXACTLY (rail
following — position is a pure function of arc progress, so vehicles never
drift onto opposing lanes through tight junction arcs), with IDM-style
longitudinal control: leader gap keeping, red-light compliance at stop-line
triggers, junction conflict yielding with deterministic right-of-way, and
don't-block-the-box holds at junction entries. All [B,V] masked array ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.maps.town_map import LaneGraph
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.structs import LightState, Scene, SimState, VehicleStates

NPC_TARGET_SPEED = 5.0     # m/s ~ TM default (30 km/h limit minus offset)
NPC_ACCEL = 1.0            # m/s^2
NPC_BRAKE = -4.95          # m/s^2 (the bicycle's brake_accel)
SAFE_TIME_HEADWAY = 1.6    # IDM
# center-to-center: two ~4.9 m vehicles need ~5 m just to touch bumpers,
# so 8 m keeps ~3 m of clear space at standstill
SAFE_MIN_GAP = 8.0
LIGHT_STOP_DIST = 5.0


def traffic_step(cfg: GlobalConfig, lanes: LaneGraph, scene: Scene,
                 state: SimState, effects: dict | None = None
                 ) -> VehicleStates:
  """Advance all NPC vehicles one tick. `effects` carries scenario
  overrides (sim/scenarios.py): forced braking and speed caps per slot."""
  s = cfg.sim
  veh = state.vehicles
  B, V = veh.yaw.shape

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

  # --- junction conflict yielding: lane corridors don't protect against
  # crossing/turning traffic (unprotected lefts, merge arcs), so predict
  # everyone over a few short horizons and yield when paths converge. The
  # LOWER slot index has right of way (deterministic symmetry break — one
  # of two conflicting vehicles always proceeds, no mutual deadlock) ---
  horizons = jnp.array([0.6, 1.1, 1.6])                         # [H]
  fwd = jnp.stack([jnp.cos(veh.yaw), jnp.sin(veh.yaw)], -1)
  p_h = veh.pos[None] + fwd[None] * (veh.speed[None] *
                                     horizons[:, None, None])[..., None]
  # min over sampled horizons: a single far horizon misses mid-horizon
  # crossings (both vehicles past the meet point by then)
  d_fut = jnp.min(jnp.linalg.norm(p_h[:, :, :, None] - p_h[:, :, None],
                                  axis=-1), 0)                  # [B,V,V]
  # only CROSSING paths conflict — parallel lanes (same direction) and
  # opposing lanes (head-on pass at ~3.5 m lateral) are lane-separated and
  # must not trigger mutual yields
  hdiff = jnp.abs(geo.normalize_angle(veh.yaw[:, :, None] -
                                      veh.yaw[:, None]))
  crossing = (hdiff > 0.4) & (hdiff < 2.7)
  conflict = (d_fut < 4.5) & crossing & veh.valid[:, None] & \
      veh.valid[:, :, None] & not_self
  # Never yield to a STOPPED vehicle — frontal protection is the gap
  # check's job, and waiting on a waiter is how gridlock rings form.
  rank = jnp.arange(V)
  other_moving = veh.speed[:, None, :] > 0.3
  yield_to = conflict & (rank[None, None, :] < rank[None, :, None]) & \
      other_moving
  ego_fwd = jnp.stack([jnp.cos(state.ego.yaw), jnp.sin(state.ego.yaw)], -1)
  ego_h = state.ego.pos[None] + ego_fwd[None] * \
      (state.ego.speed[None] * horizons[:, None])[..., None]    # [H,B,2]
  ego_hdiff = jnp.abs(geo.normalize_angle(veh.yaw - state.ego.yaw[:, None]))
  # yield to the ego whenever paths converge (the C++ TrafficManager never
  # contests the ego) — except the clean head-on pass in the opposing lane
  # (laterally separated in the NPC's frame), and only while the ego moves
  # (a stopped ego must not freeze crossing traffic; the expert is already
  # braking for us, mutual waits deadlock)
  rel_e = geo.world_to_ego(state.ego.pos[:, None], veh.pos, veh.yaw)
  headon_pass = (ego_hdiff > 2.7) & (jnp.abs(rel_e[..., 1]) > 2.0)
  d_ego_fut = jnp.min(jnp.linalg.norm(p_h - ego_h[:, :, None], axis=-1), 0)
  ego_conflict = (d_ego_fut < 4.5) & ~headon_pass & \
      (state.ego.speed[:, None] > 0.3)
  junction_yield = jnp.any(yield_to, -1) | ego_conflict

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

  # --- successor choice (varies per vehicle slot so traffic spreads
  # across junction branches) + don't-block-the-box: hold at the junction
  # entry while the chosen connector's EXIT area is occupied ---
  total_here = lanes.total_len[veh.lane_id]
  succs = lanes.successor[veh.lane_id]                    # [B,V,MS]
  n_succ = jnp.sum(succs >= 0, -1)
  choice = jnp.where(n_succ > 0,
                     jnp.arange(V)[None] % jnp.maximum(n_succ, 1), 0)
  nxt = jnp.take_along_axis(succs, choice[..., None], -1)[..., 0]   # [B,V]
  near_end = (total_here - veh.lane_t) < 3.0
  nxt_safe = jnp.maximum(nxt, 0)
  exit_pt, _ = lanes.position_at(nxt_safe,
                                 lanes.total_len[nxt_safe] - 1.0)   # [B,V,2]
  d_exit = jnp.linalg.norm(exit_pt[:, :, None] - veh.pos[:, None],
                           axis=-1)                                 # [B,V,V]
  exit_occupied = jnp.any((d_exit < 5.0) & veh.valid[:, None] & not_self, -1)
  exit_occupied |= jnp.linalg.norm(exit_pt - state.ego.pos[:, None],
                                   axis=-1) < 5.0
  box_hold = near_end & (nxt >= 0) & exit_occupied

  # --- frontal protection vs the EGO via rail lookahead: the straight
  # corridor gap test above misses an ego that sits laterally offset
  # (>2 m off the rail but boxes still overlapping) or around a CURVED
  # connector arc — the r3 route-0 failure: NPCs rail-followed through a
  # stopped ego at a junction, re-colliding after every dedup window
  # (7 same-spot collisions). The C++ TrafficManager's collision stage
  # always yields to a blocking actor regardless of geometry; here the
  # NPC's own future box along its ACTUAL rail is tested against the ego
  # box (10 m covers the stopping distance from rail speed 5 m/s). ---
  look_d = jnp.array([0.0, 1.0, 2.5, 4.5, 7.0, 10.0])
  lt_f = jnp.minimum(veh.lane_t[..., None] + look_d[None, None],
                     total_here[..., None])                     # [B,V,D]
  lid_f = jnp.broadcast_to(veh.lane_id[..., None], lt_f.shape)
  pos_f, yaw_f = lanes.position_at(lid_f, lt_f)                 # [B,V,D,2]
  ego_e = jnp.array([s.ego_extent_x, s.ego_extent_y])
  ego_block = jnp.any(geo.obb_intersect(
      pos_f, yaw_f, veh.extent[:, :, None],
      state.ego.pos[:, None, None], state.ego.yaw[:, None, None],
      ego_e[None, None, None]), -1) & veh.valid

  # --- IDM-style longitudinal control on the rail ---
  dead_ahead = (nxt < 0) & ((total_here - veh.lane_t) < 12.0)
  target_speed = jnp.where(dead_ahead, 2.0, NPC_TARGET_SPEED)
  if effects is not None:
    target_speed = jnp.minimum(target_speed, effects["npc_speed_cap"])
  desired_gap = SAFE_MIN_GAP + veh.speed * SAFE_TIME_HEADWAY
  brake = (gap < desired_gap) | light_block | junction_yield | box_hold | \
      ego_block | (veh.speed > target_speed + 0.5)
  if effects is not None:
    brake = brake | effects["npc_brake_override"]
  accel = jnp.where(brake, NPC_BRAKE,
                    jnp.where(veh.speed < target_speed, NPC_ACCEL, 0.0))
  speed = jnp.clip(veh.speed + accel * s.dt, 0.0,
                   jnp.maximum(target_speed, veh.speed))
  speed = jnp.where(veh.valid, speed, 0.0)

  # --- rail following: position is a pure function of lane progress ---
  lane_t = veh.lane_t + speed * s.dt
  wrap = (lane_t >= total_here) & (nxt >= 0)
  lane_id = jnp.where(wrap, nxt, veh.lane_id).astype(jnp.int32)
  lane_t2 = jnp.where(wrap, lane_t - total_here,
                      jnp.minimum(lane_t, total_here))
  pos, yaw = lanes.position_at(lane_id, lane_t2)
  yaw = geo.normalize_angle(yaw)
  pos = jnp.where(veh.valid[..., None], pos, veh.pos)
  yaw = jnp.where(veh.valid, yaw, veh.yaw)

  # equivalent bicycle controls for the expert's constant-action forecast
  # (autopilot.py:616-667 consumes steer/throttle/brake): steer from the
  # observed yaw rate, throttle/brake from the acceleration sign
  yaw_rate = geo.normalize_angle(yaw - veh.yaw) / s.dt
  steer = jnp.clip(yaw_rate * (s.front_wb + s.rear_wb) /
                   (jnp.maximum(speed, 0.5) * s.steer_gain), -1.0, 1.0)
  # bicycle accel = throt_accel * throttle (m/s^2); allow >1 so the
  # expert's constant-action forecast reproduces the true rail accel
  throttle = jnp.where(accel > 0, accel / s.throt_accel, 0.0)

  # --- despawn at dead ends and on long standstill (anti-deadlock — the
  # TrafficManager also recycles stuck vehicles; 40 s >> any legitimate
  # red-light wait) ---
  stand = jnp.where(speed < 0.05, veh.stand_ticks + 1, 0).astype(jnp.int32)
  deadlocked = stand > 800
  if effects is not None and "npc_speed_cap" in effects:
    deadlocked &= effects["npc_speed_cap"] > 0.01    # scenario-held exempt
  despawn = ((lane_t2 >= total_here - 1.0) & (nxt < 0)) | deadlocked
  valid = veh.valid & ~despawn

  # --- stuck-detection ring buffers (autopilot.py:572-581) ---
  def push(buf, v):
    return jnp.concatenate([buf[..., 1:], v[..., None]], -1)

  return veh.replace(
      pos=pos, yaw=yaw, speed=speed, valid=valid,
      control=jnp.stack([steer, throttle,
                         brake.astype(jnp.float32)], -1),
      buf_vel=push(veh.buf_vel, speed),
      buf_throttle=push(veh.buf_throttle, throttle),
      buf_brake=push(veh.buf_brake, brake.astype(jnp.float32)),
      lane_id=lane_id, lane_t=lane_t2,
      stand_ticks=stand)


def walker_step(cfg: GlobalConfig, scene: Scene, state: SimState):
  """Crossing-walker scenario dynamics (DynamicObjectCrossing semantics)."""
  s = cfg.sim
  wlk = state.walkers
  spec = scene.walkers_spec
  d_ego = jnp.linalg.norm(wlk.pos - state.ego.pos[:, None], axis=-1)
  from carla_garage_tpu.sim.triggers import in_time_to_arrival
  tta_hit = (spec.trigger_tta > 0) & in_time_to_arrival(
      state.ego.pos[:, None], state.ego.speed[:, None], wlk.pos,
      spec.trigger_tta)
  trigger = wlk.valid & ((d_ego < spec.trigger_dist) | tta_hit)
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
