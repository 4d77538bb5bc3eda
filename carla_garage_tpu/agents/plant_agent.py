"""PlanT closed-loop agent — learned object-level policy in the env step.

Re-design of team_code/plant_agent.py:28-229: extracts privileged
object-level tokens (vehicles, walkers, route segments) in the ego frame,
runs the PlanT transformer, and converts waypoint predictions to controls
with the PID controllers — all inside the jitted sim step, so a whole
benchmark of PlanT episodes runs as one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from carla_garage_tpu.agents.controllers import (control_pid,
                                                 control_pid_direct)
from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.models.plant import PlanT, PlanTConfig
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.sim.expert import (Control, _dense_planner_params,
                                         _sparse_planner_params,
                                         _sparse_seg_len)
from carla_garage_tpu.sim.route_planner import planner_step, route_lookup
from carla_garage_tpu.structs import PIDState, PlannerState, Scene, SimState


class TokenType:
  VEHICLE = 0
  WALKER = 1
  LIGHT = 2
  STOP = 3
  ROUTE = 4
  OTHER = 5


@struct.dataclass
class PlanTAgentState:
  planner_dense: PlannerState
  planner_sparse: PlannerState
  pid_turn: PIDState
  pid_speed: PIDState


def plant_agent_reset(cfg: GlobalConfig, B: int) -> PlanTAgentState:
  return PlanTAgentState(
      planner_dense=PlannerState(idx=jnp.zeros((B,), jnp.int32),
                                 is_last=jnp.zeros((B,), bool)),
      planner_sparse=PlannerState(idx=jnp.zeros((B,), jnp.int32),
                                  is_last=jnp.zeros((B,), bool)),
      pid_turn=PIDState.create((B,), cfg.expert.turn_n),
      pid_speed=PIDState.create((B,), cfg.expert.speed_n))


def extract_tokens(cfg: GlobalConfig, pcfg: PlanTConfig, scene: Scene,
                   state: SimState, dense_idx: jnp.ndarray):
  """Privileged object tokens in the ego frame (plant_agent.py inputs).

  Returns (tokens [B,T,A], types [B,T], valid [B,T]) with
  T = V + W + num_route_segments, A = 7 attributes
  (x, y, extent_x, extent_y, yaw, speed, brake)."""
  ego = state.ego
  veh, wlk = state.vehicles, state.walkers
  B, V = veh.yaw.shape
  W = wlk.yaw.shape[1]

  def obj_tokens(pos, yaw, extent, speed, brake, valid):
    rel = geo.world_to_ego(pos, ego.pos[:, None], ego.yaw[:, None])
    ryaw = geo.normalize_angle(yaw - ego.yaw[:, None])
    d = jnp.linalg.norm(rel, axis=-1)
    ok = valid & (d < cfg.expert.detection_radius)
    attrs = jnp.stack([rel[..., 0], rel[..., 1], extent[..., 0],
                       extent[..., 1], ryaw, speed, brake], -1)
    return jnp.where(ok[..., None], attrs, 0.0), ok

  v_tok, v_ok = obj_tokens(veh.pos, veh.yaw, veh.extent, veh.speed,
                           veh.control[..., 2], veh.valid)
  w_tok, w_ok = obj_tokens(wlk.pos, wlk.yaw, wlk.extent, wlk.speed,
                           jnp.zeros((B, W)), wlk.valid)

  # route segments: pairs of consecutive forward route points
  # (plant.py route tokens; num_route_points config.py:190)
  n_seg = pcfg.max_tokens - V - W
  n_pts = 2 * n_seg
  offs = jnp.arange(n_pts) * 2               # stride-2 look-ahead (~2 m apart)
  q = dense_idx[:, None] + offs[None]
  R = scene.route.points.shape[1]
  qc = jnp.clip(q, 0, R - 1)
  pts = jnp.take_along_axis(scene.route.points, qc[..., None], 1)   # [B,n,2]
  rel_pts = geo.world_to_ego(pts, ego.pos[:, None], ego.yaw[:, None])
  p0 = rel_pts[:, 0::2][:, :n_seg]
  p1 = rel_pts[:, 1::2][:, :n_seg]
  mid = (p0 + p1) / 2.0
  d = p1 - p0
  seg_yaw = jnp.arctan2(d[..., 1], d[..., 0])
  seg_len = jnp.linalg.norm(d, axis=-1)
  in_route = (q[:, 1::2][:, :n_seg] < scene.route.num_valid[:, None])
  r_tok = jnp.stack([mid[..., 0], mid[..., 1], seg_len / 2.0,
                     jnp.full_like(seg_len, 1.0), seg_yaw,
                     jnp.zeros_like(seg_len), jnp.zeros_like(seg_len)], -1)
  r_tok = jnp.where(in_route[..., None], r_tok, 0.0)

  tokens = jnp.concatenate([v_tok, w_tok, r_tok], 1)
  types = jnp.concatenate([
      jnp.full((B, V), TokenType.VEHICLE, jnp.int32),
      jnp.full((B, W), TokenType.WALKER, jnp.int32),
      jnp.full((B, n_seg), TokenType.ROUTE, jnp.int32)], 1)
  valid = jnp.concatenate([v_ok, w_ok, in_route], 1)
  return tokens, types, valid


def make_plant_policy(model: PlanT, params, pcfg: PlanTConfig,
                      direct: bool = False,
                      brake_threshold: float = 0.5):
  """Returns a PolicyFn running PlanT inside the env step.

  direct=True drives from the classified target speed + checkpoint aim
  angle (the DIRECT operating point — robust to the IL inertia problem)
  instead of the waypoint controller."""
  target_speeds = jnp.array([0.0, 2.0, 5.0, 8.0])

  def policy(cfg: GlobalConfig, maps, scene: Scene, state: SimState, rng):
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

    tokens, types, valid = extract_tokens(cfg, pcfg, scene, state,
                                          pl_dense.idx)
    out = model.apply(params, tokens, types, valid, target_point)
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
    new_ag = PlanTAgentState(planner_dense=pl_dense,
                             planner_sparse=pl_sparse,
                             pid_turn=pt2, pid_speed=ps2)
    return Control(steer=steer, throttle=throttle, brake=brake), \
        {"agent": new_ag}

  return policy
