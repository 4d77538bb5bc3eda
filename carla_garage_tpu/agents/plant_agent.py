"""PlanT closed-loop agent — learned object-level policy in the env step.

Re-design of team_code/plant_agent.py:28-229: extracts privileged
object-level tokens (nearest vehicles / walkers / red lights / stop signs
+ route points, zero-padded like plant_agent.py:142), computes the
privileged hazard flags PlanT consumes as inputs (the reference agent
inherits them from its DataAgent/autopilot parent), runs the PlanT
transformer, and converts predictions to controls with the PID
controllers — all inside the jitted sim step, so a whole benchmark of
PlanT episodes runs as one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from carla_garage_tpu.agents.controllers import (control_pid,
                                                 control_pid_direct)
from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.maps.town_map import Layer
from carla_garage_tpu.models.plant import ObjType, PlanT, PlanTConfig
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.sim.expert import (Control, _dense_planner_params,
                                         _sparse_planner_params,
                                         _sparse_seg_len)
from carla_garage_tpu.sim.route_planner import planner_step, route_lookup
from carla_garage_tpu.structs import (LightState, PIDState, PlannerState,
                                      Scene, SimState)

TokenType = ObjType      # backward-compat alias


@struct.dataclass
class PlanTAgentState:
  planner_dense: PlannerState
  planner_sparse: PlannerState
  pid_turn: PIDState
  pid_speed: PIDState
  cleared_stop_signs: jnp.ndarray    # [B,S] bool (autopilot.py:1013-1070)
  stuck_count: jnp.ndarray           # [B] int32 ticks at ~zero speed
  force_move: jnp.ndarray            # [B] int32 remaining creep frames


def plant_agent_reset(cfg: GlobalConfig, B: int) -> PlanTAgentState:
  return PlanTAgentState(
      planner_dense=PlannerState(idx=jnp.zeros((B,), jnp.int32),
                                 is_last=jnp.zeros((B,), bool)),
      planner_sparse=PlannerState(idx=jnp.zeros((B,), jnp.int32),
                                  is_last=jnp.zeros((B,), bool)),
      pid_turn=PIDState.create((B,), cfg.expert.turn_n),
      pid_speed=PIDState.create((B,), cfg.expert.speed_n),
      cleared_stop_signs=jnp.zeros((B, cfg.sim.max_stop_signs), bool),
      stuck_count=jnp.zeros((B,), jnp.int32),
      force_move=jnp.zeros((B,), jnp.int32))


def privileged_flags(cfg: GlobalConfig, maps, scene: Scene, state: SimState,
                     cleared_stops: jnp.ndarray, dense_idx: jnp.ndarray):
  """light_hazard / stop_hazard / junction flags like the expert computes
  them (autopilot.py:944-1070) — PlanT gets these as INPUTS.

  Returns (light [B], stop [B], junction [B], new_cleared [B,S])."""
  e, s = cfg.expert, cfg.sim
  ego = state.ego
  ego_e = jnp.array([s.ego_extent_x, s.ego_extent_y])
  # forward probe box ~ braking distance (a light affects us if our near
  # future path crosses its stop line)
  fwd = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)], -1)
  reach = 2.0 + 0.6 * ego.speed
  probe_c = ego.pos + fwd * reach[:, None]
  probe_e = jnp.stack([reach + s.ego_extent_x,
                       jnp.full_like(reach, s.ego_extent_y)], -1)

  lights = scene.lights
  lstate = lights.state_at(state.time_s)
  facing = jnp.abs(geo.normalize_angle(
      lights.yaw - ego.yaw[:, None])) < 0.8
  lnear = lights.valid & facing & (jnp.linalg.norm(
      lights.pos - ego.pos[:, None], axis=-1) < e.light_radius)
  hit = geo.obb_intersect(probe_c[:, None], ego.yaw[:, None], probe_e[:, None],
                          lights.pos, lights.yaw, lights.extent)
  hit |= geo.obb_intersect(ego.pos[:, None], ego.yaw[:, None],
                           ego_e[None, None],
                           lights.pos, lights.yaw, lights.extent)
  is_red = (lstate == LightState.RED) | (lstate == LightState.YELLOW)
  # nearest affecting light only (see expert_step — diagonal approaches
  # can face both phase groups)
  affects = lnear & hit
  d_aff = jnp.where(affects, jnp.linalg.norm(
      lights.pos - ego.pos[:, None], axis=-1), jnp.inf)
  best = jnp.argmin(d_aff, -1)
  light = jnp.any(affects, -1) & \
      jnp.take_along_axis(is_red, best[:, None], 1)[:, 0]

  stops = scene.stops
  sfacing = jnp.abs(geo.normalize_angle(
      stops.yaw - ego.yaw[:, None])) < 0.8
  snear = stops.valid & sfacing & (jnp.linalg.norm(
      stops.pos - ego.pos[:, None], axis=-1) < e.light_radius)
  st_hit = geo.obb_intersect(ego.pos[:, None], ego.yaw[:, None],
                             ego_e[None, None],
                             stops.pos, stops.yaw, stops.extent) & snear
  st_probe = geo.obb_intersect(probe_c[:, None], ego.yaw[:, None],
                               probe_e[:, None],
                               stops.pos, stops.yaw, stops.extent) & snear
  uncleared = ~cleared_stops
  moving = ego.speed > 1e-2
  stop = jnp.any((st_hit | st_probe) & uncleared, -1) & moving
  newly_cleared = st_hit & uncleared & ~moving[:, None]
  new_cleared = (cleared_stops | newly_cleared) & snear

  junction = maps.sample(scene.town_id[:, None], Layer.JUNCTION,
                         ego.pos[:, None])[:, 0]
  R = scene.route.points.shape[1]
  route_junc = jnp.take_along_axis(
      scene.route.is_junction,
      jnp.clip(dense_idx, 0, R - 1)[:, None], 1)[:, 0]
  return light.astype(jnp.float32), stop.astype(jnp.float32), \
      (junction | route_junc).astype(jnp.float32), new_cleared


def extract_objects(cfg: GlobalConfig, pcfg: PlanTConfig, scene: Scene,
                    state: SimState):
  """Nearest-first object boxes in the ego frame (plant_agent.py:120-154):
  vehicles, walkers, red/yellow lights, stop signs; zero-padded (type 0)
  to max_objects. Returns (boxes [B,O,7], types [B,O])."""
  ego = state.ego
  veh, wlk = state.vehicles, state.walkers
  B = ego.yaw.shape[0]

  def rel_attrs(pos, yaw, extent, speed, brake):
    rel = geo.world_to_ego(pos, ego.pos[:, None], ego.yaw[:, None])
    ryaw = geo.normalize_angle(yaw - ego.yaw[:, None])
    return jnp.stack([rel[..., 0], rel[..., 1], extent[..., 0],
                      extent[..., 1], ryaw, speed, brake], -1)

  lights, stops = scene.lights, scene.stops
  lstate = lights.state_at(state.time_s)
  l_red = ((lstate == LightState.RED) | (lstate == LightState.YELLOW)) & \
      lights.valid
  zeros_l = jnp.zeros_like(lights.yaw)
  zeros_s = jnp.zeros_like(stops.yaw)
  attrs = jnp.concatenate([
      rel_attrs(veh.pos, veh.yaw, veh.extent, veh.speed,
                veh.control[..., 2]),
      rel_attrs(wlk.pos, wlk.yaw, wlk.extent, wlk.speed,
                jnp.zeros_like(wlk.speed)),
      rel_attrs(lights.pos, lights.yaw, lights.extent, zeros_l, zeros_l),
      rel_attrs(stops.pos, stops.yaw, stops.extent, zeros_s, zeros_s)], 1)
  V, W = veh.yaw.shape[1], wlk.yaw.shape[1]
  L, S = lights.yaw.shape[1], stops.yaw.shape[1]
  types = jnp.concatenate([
      jnp.full((B, V), ObjType.VEHICLE, jnp.int32),
      jnp.full((B, W), ObjType.WALKER, jnp.int32),
      jnp.full((B, L), ObjType.LIGHT, jnp.int32),
      jnp.full((B, S), ObjType.STOP, jnp.int32)], 1)
  valid = jnp.concatenate([veh.valid, wlk.valid, l_red, stops.valid], 1)
  d = jnp.linalg.norm(attrs[..., :2], axis=-1)
  valid &= d < 32.0
  order = jnp.argsort(jnp.where(valid, d, jnp.inf), axis=-1)
  order = order[:, :pcfg.max_objects]
  sel_attr = jnp.take_along_axis(attrs, order[..., None], 1)
  sel_valid = jnp.take_along_axis(valid, order, 1)
  sel_types = jnp.take_along_axis(types, order, 1)
  boxes = jnp.where(sel_valid[..., None], sel_attr, 0.0)
  box_types = jnp.where(sel_valid, sel_types, ObjType.VEHICLE)
  return boxes, box_types


def extract_route(pcfg: PlanTConfig, scene: Scene, state: SimState,
                  dense_idx: jnp.ndarray):
  """Route tokens: num_route_points dense points at 2 m spacing."""
  ego = state.ego
  R = scene.route.points.shape[1]
  offs = jnp.arange(pcfg.num_route_points) * 2
  q = jnp.clip(dense_idx[:, None] + offs[None], 0, R - 1)
  pts = jnp.take_along_axis(scene.route.points, q[..., None], 1)
  return geo.world_to_ego(pts, ego.pos[:, None], ego.yaw[:, None])


def make_plant_policy(model: PlanT, params, pcfg: PlanTConfig,
                      direct: bool = False,
                      brake_threshold: float = 0.5,
                      creep: bool = True):
  """Returns a PolicyFn running PlanT inside the env step.

  direct=True drives from the classified target speed + checkpoint aim
  angle (the DIRECT operating point — robust to the IL inertia problem)
  instead of the waypoint controller.

  creep=True adds the stuck->creep recovery the SensorAgent has
  (sensor_agent.py:561-599): after stuck_threshold ticks at ~zero speed,
  throttle forward for creep_duration frames unless the box directly
  ahead is occupied. PlanT is object-level, so the LiDAR safety-box gate
  becomes a privileged OBB test against vehicles/walkers ahead. Without
  it the dominant real-benchmark failure is collide -> wedge -> 'Agent
  got blocked' (180 s at <0.1 m/s, atomic_criteria ActorSpeedAbove)."""
  target_speeds = jnp.array([0.0, 2.0, 5.0, 8.0])

  def policy(cfg: GlobalConfig, maps, scene: Scene, state: SimState, rng,
             params_rt=None):
    params_ = params_rt if params_rt is not None else params
    ag: PlanTAgentState = state.agent
    ego = state.ego
    pl_dense = jax.vmap(lambda st, pts, sl, nv, p: planner_step(
        st, pts, sl, nv, p, _dense_planner_params(cfg)))(
        ag.planner_dense, scene.route.points, scene.route.seg_len,
        scene.route.num_valid, ego.pos)
    pl_sparse = jax.vmap(lambda st, pts, nv, p: planner_step(
        st, pts, _sparse_seg_len(pts, nv), nv, p,
        _sparse_planner_params(cfg)))(
        ag.planner_sparse, scene.route.sparse_points,
        scene.route.sparse_num_valid, ego.pos)
    tp_world, _ = jax.vmap(
        lambda pts, c, nv, i: route_lookup(pts, c, nv, i, 1))(
        scene.route.sparse_points, scene.route.sparse_cmd,
        scene.route.sparse_num_valid, pl_sparse.idx)
    target_point = geo.world_to_ego(tp_world, ego.pos, ego.yaw)

    boxes, box_types = extract_objects(cfg, pcfg, scene, state)
    route = extract_route(pcfg, scene, state, pl_dense.idx)
    light, stop, junction, cleared = privileged_flags(
        cfg, maps, scene, state, ag.cleared_stop_signs, pl_dense.idx)
    out = model.apply(params_, boxes, box_types, route, light, stop,
                      junction, ego.speed)
    if direct:
      probs = jax.nn.softmax(out["pred_target_speed"])
      ts = jnp.sum(probs * target_speeds, -1)
      # brake_uncertainty_threshold (0.5 default; 0.33 = the longest6
      # operating point, README.md:82-84)
      ts = jnp.where(probs[:, 0] > brake_threshold, 0.0, ts)
      aim = out["pred_checkpoint"][:, 2]
      angle = jnp.degrees(jnp.arctan2(aim[:, 1], aim[:, 0])) / 90.0
      steer, throttle, brake, pt2, ps2 = control_pid_direct(
          ag.pid_turn, ag.pid_speed, ts, angle, ego.speed, cfg)
    else:
      steer, throttle, brake, pt2, ps2 = control_pid(
          ag.pid_turn, ag.pid_speed, out["pred_wp"], ego.speed, cfg)

    stuck, force = ag.stuck_count, ag.force_move
    if creep:
      # --- stuck -> creep recovery (sensor_agent.py:561-599 semantics,
      # privileged front-box gate instead of LiDAR returns) ---
      e, s = cfg.expert, cfg.sim
      stuck = jnp.where(ego.speed < 0.1, ag.stuck_count + 1, 0)
      start_creep = stuck > e.stuck_threshold
      force = jnp.where(start_creep, e.creep_duration,
                        jnp.maximum(ag.force_move - 1, 0))
      fwd = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)], -1)
      box_c = ego.pos + fwd * (s.ego_extent_x + 1.25)
      box_e = jnp.stack([jnp.full_like(ego.yaw, 1.25),
                         jnp.full_like(ego.yaw, s.ego_extent_y * 0.8)], -1)
      veh, wlk = state.vehicles, state.walkers
      hit_v = geo.obb_intersect(box_c[:, None], ego.yaw[:, None],
                                box_e[:, None],
                                veh.pos, veh.yaw, veh.extent) & veh.valid
      hit_w = geo.obb_intersect(box_c[:, None], ego.yaw[:, None],
                                box_e[:, None],
                                wlk.pos, wlk.yaw, wlk.extent) & wlk.valid
      obstructed = jnp.any(hit_v, -1) | jnp.any(hit_w, -1)
      creeping = (force > 0) & ~obstructed
      # an obstructed creep re-arms for when the box clears (ref :599)
      force = jnp.where((force > 0) & obstructed, e.creep_duration, force)
      throttle = jnp.where(creeping, e.creep_throttle, throttle)
      brake = jnp.where(creeping, 0.0,
                        jnp.where((force > 0) & obstructed, 1.0, brake))
      stuck = jnp.where(creeping, 0, stuck)

    new_ag = PlanTAgentState(planner_dense=pl_dense,
                             planner_sparse=pl_sparse,
                             pid_turn=pt2, pid_speed=ps2,
                             cleared_stop_signs=cleared,
                             stuck_count=stuck.astype(jnp.int32),
                             force_move=force.astype(jnp.int32))
    return Control(steer=steer, throttle=throttle, brake=brake), \
        {"agent": new_ag}

  return policy
