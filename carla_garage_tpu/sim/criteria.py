"""Per-tick infraction criteria — vectorized atomic_criteria_local.py.

The reference evaluates infractions with py_trees criterion nodes attached to
the scenario tree (atomic_criteria_local.py: Collision :300-437, RouteCompletion
:1588-1693, OutsideRouteLanes :1040-1233, RunningRedLight :1696+, RunningStop
:1883-2048, blocked :440, route deviation/timeout in route_scenario_local.py).
Here every criterion is a masked per-tick array update over [B] episodes; the
episode reduction to driving score happens in scoring.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.maps.town_map import Layer, MapStack
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.structs import (CriteriaState, LightState, Scene,
                                      SimState)

ROUTE_MATCH_DIST = 10.0   # waypoint pass distance (RouteCompletion WINDOWS)
ROUTE_WINDOW = 64


MAX_EVENTS = 16


def criteria_reset(B: int, V: int, W: int, L: int, S: int) -> CriteriaState:
  z_i = jnp.zeros((B,), jnp.int32)
  z_b = jnp.zeros((B,), bool)
  z_f = jnp.zeros((B,), jnp.float32)
  return CriteriaState(
      event_pos=jnp.zeros((B, MAX_EVENTS, 2)),
      event_kind=jnp.zeros((B, MAX_EVENTS), jnp.int32),
      event_tick=jnp.zeros((B, MAX_EVENTS), jnp.int32),
      event_count=z_i,
      penalty=jnp.ones((B,), jnp.float32),
      n_collision_vehicle=z_i, n_collision_walker=z_i, n_collision_static=z_i,
      n_red_light=z_i, n_stop_sign=z_i,
      route_completion=z_f, max_route_idx=z_i,
      outside_lane_m=z_f, driven_m=z_f, blocked_ticks=z_i,
      deviated=z_b, blocked=z_b, timed_out=z_b,
      veh_overlap=jnp.zeros((B, V), jnp.int32),
      wlk_overlap=jnp.zeros((B, W), jnp.int32),
      static_overlap=z_i,
      red_light_cooldown=jnp.zeros((B, L), bool),
      stop_pending=jnp.zeros((B, S), bool),
      stop_done=jnp.zeros((B, S), bool),
      stop_entered=jnp.zeros((B, S), bool))


def criteria_step(cfg: GlobalConfig, maps: MapStack, scene: Scene,
                  prev_pos: jnp.ndarray, state: SimState) -> CriteriaState:
  """Update all criteria after the world advanced one tick."""
  c = cfg.criteria
  s = cfg.sim
  cr = state.criteria
  ego = state.ego
  B = ego.yaw.shape[0]
  ego_e = jnp.array([s.ego_extent_x, s.ego_extent_y])

  step_m = jnp.linalg.norm(ego.pos - prev_pos, axis=-1)
  driven_m = cr.driven_m + step_m

  # --- route completion / deviation (atomic_criteria_local.py:1588-1693) ---
  R = scene.route.points.shape[1]
  w = jnp.arange(ROUTE_WINDOW)
  q = jnp.clip(cr.max_route_idx[:, None] + w[None], 0, R - 1)     # [B,Wd]
  wp = jnp.take_along_axis(scene.route.points, q[..., None], 1)   # [B,Wd,2]
  d = jnp.linalg.norm(wp - ego.pos[:, None], axis=-1)
  in_route = q < scene.route.num_valid[:, None]
  close = (d < ROUTE_MATCH_DIST) & in_route
  best = jnp.max(jnp.where(close, w[None], -1), -1)               # [B]
  new_idx = jnp.where(best >= 0, cr.max_route_idx + best,
                      cr.max_route_idx)
  seg = scene.route.seg_len                                       # [B,R]
  mask_r = jnp.arange(R)[None] < scene.route.num_valid[:, None]
  total_len = jnp.sum(jnp.where(mask_r, seg, 0.0), -1)
  cum_mask = jnp.arange(R)[None] <= new_idx[:, None]
  passed_len = jnp.sum(jnp.where(mask_r & cum_mask, seg, 0.0), -1)
  completion = jnp.clip(passed_len / jnp.maximum(total_len, 1e-3), 0.0, 1.0)
  at_end = new_idx >= (scene.route.num_valid - 2)
  # the leaderboard grants completion when the ego reaches the goal area
  # (RouteCompletion DISTANCE_THRESHOLD at the final waypoint)
  R_last = jnp.clip(scene.route.num_valid - 1, 0, R - 1)
  goal = jnp.take_along_axis(scene.route.points, R_last[:, None, None], 1)
  near_goal = jnp.linalg.norm(goal[:, 0] - ego.pos, axis=-1) < \
      ROUTE_MATCH_DIST
  completion = jnp.where(at_end | near_goal, 1.0, completion)
  # nearest-route distance for deviation / wrong-lane: the match pointer
  # sits up to 10 m AHEAD of the ego, so this window looks behind too
  qb = jnp.clip(cr.max_route_idx[:, None] - 16 + w[None], 0, R - 1)
  wpb = jnp.take_along_axis(scene.route.points, qb[..., None], 1)
  db = jnp.linalg.norm(wpb - ego.pos[:, None], axis=-1)
  in_route_b = qb < scene.route.num_valid[:, None]
  min_d = jnp.min(jnp.where(in_route_b, db, jnp.inf), -1)
  deviated = cr.deviated | (min_d > c.route_deviation_m)

  # --- outside route lanes (:1040-1233): the reference splits the driven
  # distance into off-road (sidewalk/terrain) and wrong-direction lane via
  # waypoint lane topology. Here the map's LANE_DIR channel carries the
  # travel direction of the nearest lane (16 yaw bins, maps/lane_graph.py);
  # driving against it outside a junction is the opposite-lane case.
  on_road = maps.sample(scene.town_id[:, None], Layer.ROAD,
                        ego.pos[:, None])[:, 0]
  in_junc = maps.sample(scene.town_id[:, None], Layer.JUNCTION,
                        ego.pos[:, None])[:, 0]
  # The reference resolves the ego to its NEAREST driving-lane waypoint
  # and flags distance driven where that lane's direction OPPOSES the
  # route's (atomic_criteria :1040-1233) — so an ego straddling the
  # centerline still maps to its own lane, and reversing during a
  # recovery maneuver is not "wrong lane". A single-pixel raster sample
  # under the ego flags a half-lane graze as opposite-lane; instead probe
  # laterally at {0, ±half-lane} and flag only when NO reachable lane
  # pixel agrees with the LOCAL ROUTE heading (nearest-lane semantics).
  nb_rel = jnp.argmin(jnp.where(in_route_b, db, jnp.inf), -1)       # [B]
  nb = jnp.take_along_axis(qb, nb_rel[:, None], 1)[:, 0]            # [B]
  p0 = jnp.take_along_axis(scene.route.points, nb[:, None, None],
                           1)[:, 0]
  p1 = jnp.take_along_axis(scene.route.points,
                           jnp.clip(nb + 1, 0, R - 1)[:, None, None],
                           1)[:, 0]
  seg_d = p1 - p0
  degenerate = jnp.linalg.norm(seg_d, axis=-1) < 1e-3
  route_yaw = jnp.where(degenerate, ego.yaw,
                        jnp.arctan2(seg_d[..., 1], seg_d[..., 0]))
  lat = jnp.stack([-jnp.sin(ego.yaw), jnp.cos(ego.yaw)], -1)    # [B,2]
  offs = jnp.asarray([0.0, -1.75, 1.75])
  probes = ego.pos[:, None] + offs[None, :, None] * lat[:, None]  # [B,3,2]
  dir_bin = maps.sample_value(scene.town_id[:, None], Layer.LANE_DIR,
                              probes)                             # [B,3]
  lane_yaw = (dir_bin - 1).astype(jnp.float32) * (2 * jnp.pi / 16.0)
  yaw_diff = jnp.abs(geo.normalize_angle(route_yaw[:, None] - lane_yaw))
  has_dir = dir_bin > 0
  agrees = has_dir & (yaw_diff <= 2.0)
  moving = ego.speed > c.blocked_speed_threshold
  wrong_lane = on_road & ~in_junc & jnp.any(has_dir, -1) & \
      ~jnp.any(agrees, -1) & moving
  off = ~on_road | wrong_lane
  outside_lane_m = cr.outside_lane_m + jnp.where(off, step_m, 0.0)

  # --- collisions (Collision criterion :300-437): counted on overlap ONSET
  # per actor, latched while contact persists (reference per-actor dedup) ---
  veh, wlk = state.vehicles, state.walkers
  ov_v = geo.obb_intersect(
      ego.pos[:, None], ego.yaw[:, None], ego_e[None, None],
      veh.pos, veh.yaw, veh.extent) & veh.valid                    # [B,V]
  ov_w = geo.obb_intersect(
      ego.pos[:, None], ego.yaw[:, None], ego_e[None, None],
      wlk.pos, wlk.yaw, wlk.extent) & wlk.valid                    # [B,W]
  # Layout collision: ego touches solid static geometry (the OBSTACLE
  # layer = off-map eroded ~2.5 m, i.e. buildings/walls). Grazing curbs or
  # grass is an outside-lane event, matching the reference's
  # collision-sensor semantics (meshes only).
  corners = geo.box_corners(ego.pos, ego.yaw, ego_e[None])         # [B,4,2]
  probe = jnp.concatenate([corners, ego.pos[:, None]], 1)
  ov_s = jnp.any(maps.sample(scene.town_id[:, None], Layer.OBSTACLE,
                             probe), -1)
  # Per-actor temporal dedup (collision_dedup_seconds, atomic_criteria_local
  # :300-437): count on contact onset only if the actor's cooldown expired;
  # refresh the cooldown while contact persists, decay it after separation.
  dedup_ticks = jnp.int32(round(c.collision_dedup_seconds * s.fps))
  hit_v = ov_v & (cr.veh_overlap == 0)
  hit_w = ov_w & (cr.wlk_overlap == 0)
  hit_s = ov_s & (cr.static_overlap == 0)
  cd_v = jnp.where(ov_v, dedup_ticks, jnp.maximum(cr.veh_overlap - 1, 0))
  cd_w = jnp.where(ov_w, dedup_ticks, jnp.maximum(cr.wlk_overlap - 1, 0))
  cd_s = jnp.where(ov_s, dedup_ticks, jnp.maximum(cr.static_overlap - 1, 0))
  new_v = jnp.sum(hit_v, -1).astype(jnp.int32)
  new_w = jnp.sum(hit_w, -1).astype(jnp.int32)
  new_s = hit_s.astype(jnp.int32)
  penalty = cr.penalty
  penalty *= jnp.power(c.penalty_collision_pedestrian,
                       new_w.astype(jnp.float32))
  penalty *= jnp.power(c.penalty_collision_vehicle, new_v.astype(jnp.float32))
  penalty *= jnp.power(c.penalty_collision_static, new_s.astype(jnp.float32))

  # --- running a red light (:1696+): the reference scores the infraction
  # when the vehicle *crosses* the stop line while red, not on box contact —
  # so we test the ego center point, latched per entry ---
  lights = scene.lights
  lstate = lights.state_at(state.time_s)
  facing_l = jnp.abs(geo.normalize_angle(
      lights.yaw - ego.yaw[:, None])) < 0.8    # only the ego's own approach
  inside = geo.point_in_obb(
      ego.pos[:, None], lights.pos, lights.yaw,
      lights.extent) & lights.valid & facing_l
  # when inside several facing boxes (diagonal junction approach), only
  # the nearest one scores — matching the expert's one-light semantics
  ld = jnp.linalg.norm(lights.pos - ego.pos[:, None], axis=-1)
  d_in = jnp.where(inside, ld, jnp.inf)
  nearest = jax.nn.one_hot(jnp.argmin(d_in, -1), inside.shape[-1],
                           dtype=bool) & inside
  red_run = nearest & (lstate == LightState.RED) & ~cr.red_light_cooldown \
      & (ego.speed > c.blocked_speed_threshold)[:, None]   # crossing = moving
  n_red_new = jnp.sum(red_run, -1).astype(jnp.int32)
  penalty *= jnp.power(c.penalty_traffic_light, n_red_new.astype(jnp.float32))
  red_latch = inside  # latched while inside; re-arm on exit

  # --- stop signs: RunningStopTest (:1883-2048) state machine ---
  # The reference targets a sign only when the ego's OWN-LANE waypoints
  # over the next 20 m enter the trigger volume (is_actor_affected_by_stop
  # walks map.get_waypoint(...).next(1.0) — so a corner-clip of an
  # adjacent lane's per-lane sign box never arms the test), records
  # _affected_by_stop when the ego CENTER point is inside the box, counts
  # a stop as completed if speed < SPEED_THRESHOLD (0.1 m/s) at ANY tick
  # while targeted (even before the box), and scores the violation on
  # release (lookahead no longer hits the box). Here the lane walk is a
  # straight 20 m heading ray (stop approaches are straight) and the box
  # point test keeps the sign's true rotation (the reference's
  # point_inside_boundingbox drops rotation — axis-aligned — which would
  # distort our diagonal synthesized signs).
  stops = scene.stops
  facing_s = jnp.abs(geo.normalize_angle(
      stops.yaw - ego.yaw[:, None])) < 0.8
  fwd = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)], -1)     # [B,2]
  t_look = jnp.linspace(0.0, 20.0, 11)
  look = ego.pos[:, None] + t_look[None, :, None] * fwd[:, None]  # [B,T,2]
  rel = look[:, None] - stops.pos[:, :, None]                 # [B,S,T,2]
  cy, sy = jnp.cos(stops.yaw), jnp.sin(stops.yaw)             # [B,S]
  lx = rel[..., 0] * cy[..., None] + rel[..., 1] * sy[..., None]
  ly = -rel[..., 0] * sy[..., None] + rel[..., 1] * cy[..., None]
  inside_pt = (jnp.abs(lx) <= stops.extent[..., 0:1]) & \
      (jnp.abs(ly) <= stops.extent[..., 1:2])                 # [B,S,T]
  gate = stops.valid & facing_s
  targeted = jnp.any(inside_pt, -1) & gate
  center_in = inside_pt[..., 0] & gate
  stopped = ego.speed < c.blocked_speed_threshold   # SPEED_THRESHOLD = 0.1
  pending_now = targeted & ~cr.stop_done
  released = cr.stop_pending & ~targeted
  violated = released & cr.stop_entered & ~cr.stop_done
  satisfied = pending_now & stopped[:, None]
  stop_done = cr.stop_done | satisfied | released
  stop_pending = pending_now
  stop_entered = (cr.stop_entered | (pending_now & center_in)) & ~stop_done
  n_stop_new = jnp.sum(violated, -1).astype(jnp.int32)
  penalty *= jnp.power(c.penalty_stop, n_stop_new.astype(jnp.float32))

  # --- blocked / timeout (route_scenario_local.py:572-578, :52-53) ---
  slow = ego.speed < c.blocked_speed_threshold
  blocked_ticks = jnp.where(slow, cr.blocked_ticks + 1, 0)
  blocked = cr.blocked | (blocked_ticks >
                          jnp.int32(c.blocked_seconds * s.fps))
  timed_out = cr.timed_out | (state.tick >= scene.timeout_ticks)

  # --- infraction event log: append (pos, kind, tick) per NEW infraction
  # this tick (TrafficEvent analog for the result parser) ---
  from carla_garage_tpu.structs import EventKind
  ev_pos, ev_kind, ev_tick, ev_n = (cr.event_pos, cr.event_kind,
                                    cr.event_tick, cr.event_count)
  E = ev_kind.shape[1]
  for flag, kind in ((new_v > 0, EventKind.COLLISION_VEHICLE),
                     (new_w > 0, EventKind.COLLISION_WALKER),
                     (new_s > 0, EventKind.COLLISION_STATIC),
                     (n_red_new > 0, EventKind.RED_LIGHT),
                     (n_stop_new > 0, EventKind.STOP_SIGN)):
    slot = jnp.clip(ev_n, 0, E - 1)
    oh = jax.nn.one_hot(slot, E, dtype=bool) & flag[:, None] & \
        (ev_n < E)[:, None]
    ev_pos = jnp.where(oh[..., None], ego.pos[:, None], ev_pos)
    ev_kind = jnp.where(oh, kind, ev_kind)
    ev_tick = jnp.where(oh, state.tick[:, None], ev_tick)
    ev_n = ev_n + (flag & (ev_n < E)).astype(jnp.int32)

  return CriteriaState(
      event_pos=ev_pos, event_kind=ev_kind, event_tick=ev_tick,
      event_count=ev_n,
      penalty=penalty,
      n_collision_vehicle=cr.n_collision_vehicle + new_v,
      n_collision_walker=cr.n_collision_walker + new_w,
      n_collision_static=cr.n_collision_static + new_s,
      n_red_light=cr.n_red_light + n_red_new,
      n_stop_sign=cr.n_stop_sign + n_stop_new,
      route_completion=jnp.maximum(cr.route_completion, completion),
      max_route_idx=new_idx.astype(jnp.int32),
      outside_lane_m=outside_lane_m, driven_m=driven_m,
      blocked_ticks=blocked_ticks.astype(jnp.int32),
      deviated=deviated, blocked=blocked, timed_out=timed_out,
      veh_overlap=cd_v, wlk_overlap=cd_w, static_overlap=cd_s,
      red_light_cooldown=red_latch,
      stop_pending=stop_pending, stop_done=stop_done,
      stop_entered=stop_entered)


def episode_done(cfg: GlobalConfig, state: SimState) -> jnp.ndarray:
  cr = state.criteria
  completed = cr.route_completion >= cfg.criteria.min_route_completion
  return completed | cr.blocked | cr.deviated | cr.timed_out
