"""Vectorized privileged expert — the reference AutoPilot as one XLA program.

Re-design of team_code/autopilot.py:30-1159 ("_get_control" §3.3 of
SURVEY.md): all hazard forecasting (closed-loop ego rollout, constant-action
vehicle rollouts, linear walker rollouts), OBB intersection tests, Bremsweg
emergency-brake box, traffic-light and stop-sign trigger logic, and the
PID controllers run batched over [B] episodes, with rollouts as lax.scan over
future frames. One call = one control for every episode in the batch.

Differences from the reference, by design:
  * Python-object loops over actors -> masked [B,V]/[B,W] array ops.
  * The reference's half-box lateral-offset quirk (autopilot.py:859-876 uses
    extent.y*sin for the longitudinal shift) is fixed to a true forward shift.
  * steer is not rounded to 3 decimals (autopilot.py:446) — pure fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.maps.town_map import Layer, MapStack
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.sim.dynamics import bicycle_step
from carla_garage_tpu.sim.pid import PIDParams, pid_step
from carla_garage_tpu.sim.route_planner import (PlannerParams, planner_step,
                                                route_lookup)
from carla_garage_tpu.structs import (Cmd, ExpertState, LightState, PIDState,
                                      PlannerState, Scene, SimState)


REPLAN_EVERY = 4   # forecast re-plans steering every 4 frames (0.2 s)


@struct.dataclass
class Control:
  steer: jnp.ndarray     # [B]
  throttle: jnp.ndarray  # [B]
  brake: jnp.ndarray     # [B]


def _turn_params(cfg: GlobalConfig) -> PIDParams:
  e = cfg.expert
  return PIDParams(e.turn_kp, e.turn_ki, e.turn_kd, e.turn_n)


def _speed_params(cfg: GlobalConfig) -> PIDParams:
  e = cfg.expert
  return PIDParams(e.speed_kp, e.speed_ki, e.speed_kd, e.speed_n)


def _dense_planner_params(cfg: GlobalConfig) -> PlannerParams:
  e = cfg.expert
  return PlannerParams(e.dense_route_planner_min_distance,
                       e.dense_route_planner_max_distance,
                       cfg.sim.route_window)


def _sparse_planner_params(cfg: GlobalConfig) -> PlannerParams:
  e = cfg.expert
  return PlannerParams(e.route_planner_min_distance,
                       e.route_planner_max_distance,
                       cfg.sim.route_window)


def _pid_throttle(pid_state: PIDState, target_speed, speed, brake, is_last,
                  cfg: GlobalConfig):
  """_get_throttle (autopilot.py:473-496)."""
  e = cfg.expert
  control_brake = (speed / jnp.maximum(target_speed, 1e-6)) > e.brake_ratio
  ts = jnp.where(brake, 0.0, target_speed)
  ts = jnp.where(is_last, 0.0, ts)
  delta = jnp.clip(ts - speed, 0.0, e.clip_delta)
  new_state, out = pid_step(pid_state, delta, _speed_params(cfg))
  throttle = jnp.clip(out, 0.0, e.clip_throttle)
  throttle = jnp.where(brake, 0.0, throttle)
  return new_state, throttle, control_brake


def _pid_steer(pid_state: PIDState, pos, yaw, target, speed, brake, is_last,
               cfg: GlobalConfig):
  """_get_steer (autopilot.py:421-448)."""
  angle = geo.angle_to_target_deg(pos, yaw, target) / 90.0
  angle = jnp.where(is_last | ((speed < 0.01) & brake), 0.0, angle)
  new_state, out = pid_step(pid_state, angle, _turn_params(cfg))
  return new_state, jnp.clip(out, -1.0, 1.0), angle


def _vehicle_forecast_parallel(cfg: GlobalConfig, veh, n_future: int):
  """Constant-action bicycle rollout in closed form — no sequential scan.

  With constant (steer, throttle, brake) the Euler recurrence
    v_{t+1} = max(v_t + a dt, 0);  yaw_{t+1} = yaw_t + v_t k dt;
    p_{t+1} = p_t + v_t dir(yaw_t + beta) dt
  unrolls to cumulative sums over the horizon: v_t is an affine ramp
  clipped at 0, yaw is a cumsum of v, positions a cumsum of headings.
  Exactly equals the reference's sequential EgoModel loop
  (autopilot.py:616-667) but runs as parallel VPU work.

  Returns (loc [T,B,V,2], yaw [T,B,V]) at steps 1..T.
  """
  e, s = cfg.expert, cfg.sim
  dt = 1.0 / e.bicycle_frame_rate
  steer = veh.control[..., 0]
  throttle = veh.control[..., 1]
  brake = veh.control[..., 2] > 0.5
  accel = jnp.where(brake, s.brake_accel, s.throt_accel * throttle)  # [B,V]
  wheel = s.steer_gain * steer
  beta = jnp.arctan(s.rear_wb / (s.front_wb + s.rear_wb) * jnp.tan(wheel))
  k = jnp.sin(beta) / s.rear_wb

  t = jnp.arange(n_future, dtype=jnp.float32)              # steps 0..T-1
  # speed BEFORE each step t (v_0 = current speed)
  v = jnp.maximum(veh.speed[None] + accel[None] * t[:, None, None] * dt, 0.0)
  # yaw BEFORE each step: exclusive cumsum of v*k*dt
  yaw_pre = veh.yaw[None] + (jnp.cumsum(v, 0) - v) * k[None] * dt
  head = yaw_pre + beta[None]
  dpos = v[..., None] * jnp.stack([jnp.cos(head), jnp.sin(head)], -1) * dt
  loc = veh.pos[None] + jnp.cumsum(dpos, 0)                # pos AFTER step t
  yaw_post = yaw_pre + v * k[None] * dt
  return loc, yaw_post


def _forecast(cfg: GlobalConfig, scene: Scene, state: SimState,
              planner_idx: jnp.ndarray):
  """Closed-loop ego forecast + Bremsweg safety box in ONE fused scan.

  Re-designs autopilot.forcast_ego_agent:810-881 (ego rollout with
  re-planned steering) and the Bremsweg box :744-772. The safety-box
  rollout consumes future_steering[o-1] at step o in the reference — which
  is exactly the value the fused scan computed in the previous iteration,
  so both run in the same lax.scan and the horizon is traversed once.

  planner_idx [B]: dense-planner pointer AFTER this tick's advance (the
  reference syncs the extrapolation planner to it, autopilot.py:286-289).
  """
  e, s = cfg.expert, cfg.sim
  n_future = int(e.extrapolation_seconds * e.bicycle_frame_rate)       # 80
  dt = 1.0 / e.bicycle_frame_rate
  ego = state.ego
  ex = state.expert
  B = ego.yaw.shape[0]
  dpp = _dense_planner_params(cfg)

  # --- initial rollout controls (autopilot.py:812-820) ---
  tgt_speed = ex.target_speed                       # previous tick's target
  _, throttle0, _ = _pid_throttle(ex.pid_speed, tgt_speed, ego.speed,
                                  jnp.zeros(B, bool), jnp.zeros(B, bool), cfg)

  # --- safety-box rollout bounds (autopilot.py:744-756) ---
  tgt = jnp.maximum(tgt_speed, 1e-3)
  bremsweg = ((ego.speed * 3.6) / 10.0) ** 2 / 2.0 + e.safety_box_safety_margin
  idx_orient = (bremsweg / tgt * e.bicycle_frame_rate).astype(jnp.int32)
  idx_margin = (1.0 / tgt * e.bicycle_frame_rate).astype(jnp.int32)
  bound = jnp.minimum(idx_margin + idx_orient, n_future)       # [B]

  # --- localize the route for the rollout: the pointer can only advance
  # ~35 points over the 4 s horizon, so the scan reads a small [B,LOCAL]
  # slice instead of dragging the full [B,R] route arrays through every
  # iteration (VMEM-resident; fixes super-linear batch scaling) ---
  LOCAL = 128
  R = scene.route.points.shape[1]
  offs = jnp.arange(LOCAL)
  qidx = jnp.clip(planner_idx[:, None] + offs[None], 0, R - 1)  # [B,LOCAL]
  local_pts = jnp.take_along_axis(scene.route.points, qidx[..., None], 1)
  local_seg = jnp.take_along_axis(scene.route.seg_len, qidx, 1)
  local_cmd = jnp.take_along_axis(scene.route.cmd, qidx, 1)
  local_nv = jnp.clip(scene.route.num_valid - planner_idx, 0, LOCAL)
  local_idx0 = jnp.zeros_like(planner_idx)

  # The safety box steers with the PREVIOUS iteration's forecast steering;
  # its steer input each iteration is the ego carry steer (steer_a), which
  # at iteration o holds fut_steer[o-1] (init: ex.steer) — the reference
  # semantics. Latency optimization: the scan re-plans steering/throttle
  # every REPLAN_EVERY frames (0.2 s) and integrates the bicycle in a
  # fused unrolled block between re-plans — 4x fewer sequential scan
  # iterations, boxes still emitted per frame.
  K = REPLAN_EVERY
  n_blocks = n_future // K

  def body2(carry, blk):
    (loc, yaw, spd, steer_a, throt_a, brake_a, pidx, ptw, psw,
     sb_loc, sb_yaw, sb_spd, sb_brake) = carry
    cf_k, cb_k, yaw_k = [], [], []
    for k in range(K):
      o = blk * K + k
      sb_brake = sb_brake | (o >= idx_margin)
      live = o < bound
      nloc, nyaw, nspd = bicycle_step(
          sb_loc, sb_yaw, sb_spd, steer_a, jnp.zeros(B),
          sb_brake.astype(jnp.float32), s, dt=dt)
      sb_loc = jnp.where(live[:, None], nloc, sb_loc)
      sb_yaw = jnp.where(live, nyaw, sb_yaw)
      sb_spd = jnp.where(live, nspd, sb_spd)

      loc, yaw, spd = bicycle_step(loc, yaw, spd, steer_a, throt_a,
                                   brake_a.astype(jnp.float32), s, dt=dt)
      fwd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], -1)
      cf_k.append(loc + fwd * (s.ego_extent_x / 2.0))
      cb_k.append(loc - fwd * (s.ego_extent_x / 2.0))
      yaw_k.append(yaw)

    pl = jax.vmap(
        lambda i, pts, sl, nv, p: planner_step(
            PlannerState(idx=i, is_last=jnp.zeros((), bool)),
            pts, sl, nv, p, dpp))(
        pidx, local_pts, local_seg, local_nv, loc)
    pidx2, is_last = pl.idx, pl.is_last
    target = jax.vmap(
        lambda pts, c, nv, i: route_lookup(pts, c, nv, i, 1)[0])(
        local_pts, local_cmd, local_nv, pidx2)
    angle = geo.angle_to_target_deg(loc, yaw, target) / 90.0
    angle = jnp.where(is_last, 0.0, angle)
    ptw2, steer_out = pid_step(PIDState(ptw), angle, _turn_params(cfg))
    steer = jnp.clip(steer_out, -1.0, 1.0)
    delta = jnp.clip(jnp.where(is_last, 0.0, tgt_speed) - spd, 0.0,
                     e.clip_delta)
    psw2, thr_out = pid_step(PIDState(psw), delta, _speed_params(cfg))
    throttle = jnp.clip(thr_out, 0.0, e.clip_throttle)
    brake_next = is_last
    fut_steer = jnp.where(brake_next, 0.0, steer)

    carry = (loc, yaw, spd, fut_steer, throttle, brake_next,
             pidx2, ptw2.window, psw2.window,
             sb_loc, sb_yaw, sb_spd, sb_brake)
    ys = (jnp.stack(cf_k), jnp.stack(cb_k), jnp.stack(yaw_k))
    return carry, ys

  init = (ego.pos, ego.yaw, ego.speed,
          ex.steer, throttle0, jnp.zeros(B, bool),
          local_idx0, ex.pid_turn.window, ex.pid_speed.window,
          jnp.zeros((B, 2)), jnp.zeros(B), tgt, jnp.zeros(B, bool))
  final, (cf, cb, eyaw) = jax.lax.scan(body2, init, jnp.arange(n_blocks))
  cf = cf.reshape((n_future,) + cf.shape[2:])
  cb = cb.reshape((n_future,) + cb.shape[2:])
  eyaw = eyaw.reshape((n_future,) + eyaw.shape[2:])
  sb_loc, sb_yaw = final[9], final[10]
  half_ex = jnp.array([s.ego_extent_x / 2.0, s.ego_extent_y])
  sb_center = geo.ego_to_world(sb_loc, ego.pos, ego.yaw)
  sb_box_yaw = geo.normalize_angle(ego.yaw + sb_yaw)
  sb_extent = jnp.array([s.ego_extent_x, s.ego_extent_y])
  return dict(ego_front=cf, ego_back=cb, ego_yaw=eyaw,       # [T,B,...]
              ego_half_extent=half_ex,
              sb_center=sb_center, sb_yaw=sb_box_yaw, sb_extent=sb_extent)


def expert_step(cfg: GlobalConfig, maps: MapStack, scene: Scene,
                state: SimState, rng: jnp.ndarray):
  """One expert control step for the whole batch.

  Returns (Control, new ExpertState). Mirrors _get_control
  (autopilot.py:260-334)."""
  e, s = cfg.expert, cfg.sim
  ego, veh, wlk, ex = state.ego, state.vehicles, state.walkers, state.expert
  B, V = veh.yaw.shape[:2]
  W = wlk.yaw.shape[1]
  T = int(e.extrapolation_seconds * e.bicycle_frame_rate)
  t_nj = int(e.extrapolation_seconds_no_junction * e.bicycle_frame_rate)

  # --- dense route planner advance (autopilot.py:265-268) ---
  pl_dense = jax.vmap(lambda st, pts, sl, nv, p: planner_step(
      st, pts, sl, nv, p, _dense_planner_params(cfg)))(
      ex.planner_dense, scene.route.points, scene.route.seg_len,
      scene.route.num_valid, ego.pos)
  near_target, near_cmd = jax.vmap(
      lambda pts, c, nv, i: route_lookup(pts, c, nv, i, 1))(
      scene.route.points, scene.route.cmd, scene.route.num_valid,
      pl_dense.idx)
  lane_change = (near_cmd == Cmd.CHANGE_LANE_LEFT) | \
                (near_cmd == Cmd.CHANGE_LANE_RIGHT)

  # --- forecasts (previous tick's junction flag gates the horizon,
  #     matching autopilot.py: junction is updated after _get_brake) ---
  prev_junction = ex.junction
  fc = _forecast(cfg, scene, state, pl_dense.idx)
  t_idx = jnp.arange(T)
  step_valid = prev_junction[None, :] | (t_idx[:, None] <= t_nj)   # [T,B]

  # near masks
  veh_dist = jnp.linalg.norm(veh.pos - ego.pos[:, None], axis=-1)
  veh_near = veh.valid & (veh_dist < e.detection_radius)            # [B,V]
  wlk_dist = jnp.linalg.norm(wlk.pos - ego.pos[:, None], axis=-1)
  wlk_in_radius = wlk.valid & (wlk_dist < e.detection_radius)
  wlk_seen_before = wlk.seen_frames > 0                             # 1-frame
  wlk_near = wlk_in_radius & wlk_seen_before                        # delay

  # stuck vehicles => use their current box at every future step
  # (autopilot.py:669-672, :694-695)
  stuck = (jnp.mean(veh.buf_vel, -1) < e.stuck_vel_threshold) & \
          (jnp.mean(veh.buf_throttle, -1) > e.stuck_throttle_threshold) & \
          (jnp.mean(veh.buf_brake, -1) < e.stuck_brake_threshold)   # [B,V]
  veh_loc, veh_yaw_t = _vehicle_forecast_parallel(cfg, veh, T)
  vloc = jnp.where(stuck[None, :, :, None], veh_loc[0:1],
                   veh_loc)                                         # [T,B,V,2]
  vyaw = jnp.where(stuck[None], veh_yaw_t[0:1], veh_yaw_t)

  # --- ego half-box vs vehicle intersections over future steps ---
  he = fc['ego_half_extent']
  front_int = geo.obb_intersect(
      fc['ego_front'][:, :, None], fc['ego_yaw'][:, :, None],
      he[None, None, None], vloc, vyaw, veh.extent[None])           # [T,B,V]
  back_int = geo.obb_intersect(
      fc['ego_back'][:, :, None], fc['ego_yaw'][:, :, None],
      he[None, None, None], vloc, vyaw, veh.extent[None])
  gate = step_valid[:, :, None] & veh_near[None]
  front_int &= gate
  back_int &= gate

  # back-only exclusion chain (autopilot.py:699-713): a vehicle that
  # intersected only our back half keeps being skipped while it still
  # back-intersects; lane changes also count back hits as hazards.
  def chain(carry, xs):
    flag = carry
    f_t, b_t = xs
    hazard_t = f_t & ~flag
    flag = jnp.where(flag, b_t, b_t & ~f_t)
    return flag, hazard_t
  _, front_hazard_t = jax.lax.scan(chain, jnp.zeros((B, V), bool),
                                   (front_int, back_int))
  vehicle_hazard = jnp.any(front_hazard_t, axis=(0, 2))
  vehicle_hazard |= jnp.any(back_int, axis=(0, 2)) & lane_change

  # --- walkers: linear forecast in closed form (autopilot.py:883-942) ---
  dt_b = 1.0 / e.bicycle_frame_rate
  steps = (t_idx.astype(jnp.float32) + 1.0)[:, None, None, None]
  wpos_t = wlk.pos[None] + wlk.direction[None] * \
      (wlk.speed[None, :, :, None] * steps * dt_b)                  # [T,B,W,2]
  wgate = step_valid[:, :, None] & wlk_near[None]
  walker_int = geo.obb_intersect(
      fc['ego_front'][:, :, None], fc['ego_yaw'][:, :, None],
      he[None, None, None], wpos_t, wlk.yaw[None], wlk.extent[None])
  walker_hazard = jnp.any(walker_int & wgate, axis=(0, 2))

  # walker_close: any forecastable walker ahead of the ego (autopilot.py:897-902)
  rel = geo.world_to_ego(wlk.pos, ego.pos[:, None], ego.yaw[:, None])
  walker_close = jnp.any(wlk_near & (rel[..., 0] > s.ego_extent_x), axis=-1)

  # --- Bremsweg safety box (computed inside the fused forecast scan) ---
  sb_c, sb_yaw, sb_e = fc['sb_center'], fc['sb_yaw'], fc['sb_extent']
  sb_veh = geo.obb_intersect(sb_c[:, None], sb_yaw[:, None], sb_e[None, None],
                             veh.pos, veh.yaw, veh.extent) & veh_near
  vehicle_hazard |= jnp.any(sb_veh, -1)
  sb_wlk = geo.obb_intersect(sb_c[:, None], sb_yaw[:, None], sb_e[None, None],
                             wlk.pos, wlk.yaw, wlk.extent) & wlk_near
  walker_hazard |= jnp.any(sb_wlk, -1)

  # --- red light (autopilot.py:944-1011): only lights FACING the ego
  # affect it (CARLA trigger volumes are per-approach; without the facing
  # filter the crossing street's opposite-phase box deadlocks the ego at
  # junction entries — one of the two is always red) ---
  lights = scene.lights
  lstate = lights.state_at(state.time_s)                            # [B,L]
  ldist = jnp.linalg.norm(lights.pos - ego.pos[:, None], axis=-1)
  facing = jnp.abs(geo.normalize_angle(
      lights.yaw - ego.yaw[:, None])) < 0.8
  lnear = lights.valid & (ldist < e.light_radius) & facing
  ego_e = jnp.array([s.ego_extent_x, s.ego_extent_y])
  hit_sb = geo.obb_intersect(sb_c[:, None], sb_yaw[:, None], sb_e[None, None],
                             lights.pos, lights.yaw, lights.extent)
  hit_ego = geo.obb_intersect(ego.pos[:, None], ego.yaw[:, None],
                              ego_e[None, None],
                              lights.pos, lights.yaw, lights.extent)
  affects = lnear & (hit_sb | hit_ego)
  is_red = (lstate == LightState.RED) | (lstate == LightState.YELLOW)
  # only the NEAREST affecting light governs (one trigger volume per lane
  # in CARLA) — on diagonal junction approaches the facing cone can match
  # both phase groups, and "any red" would read as permanently red
  d_aff = jnp.where(affects, ldist, jnp.inf)
  best = jnp.argmin(d_aff, -1)
  light_hazard = jnp.any(affects, -1) & \
      jnp.take_along_axis(is_red, best[:, None], 1)[:, 0]

  # --- stop signs (autopilot.py:1013-1070), aligned with the criterion's
  # RunningStopTest targeting (sim/criteria.py 20 m own-lane lookahead):
  # the old ego-box-contact gate braked only INSIDE the trigger volume, so
  # an ego entering at speed came to its full stop past the box — the
  # criterion's release then scored a violation the expert never saw
  # (11 expert stop infractions across honest Longest6 r3). Now the expert
  # targets exactly what the criterion targets and fully stops before or
  # inside the box, which satisfies the machine at ANY tick while
  # targeted. ---
  stops = scene.stops
  sdist = jnp.linalg.norm(stops.pos - ego.pos[:, None], axis=-1)
  sfacing = jnp.abs(geo.normalize_angle(
      stops.yaw - ego.yaw[:, None])) < 0.8
  svalid = stops.valid & sfacing
  fwd2 = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)], -1)
  t_look = jnp.linspace(0.0, 20.0, 11)
  look = ego.pos[:, None] + t_look[None, :, None] * fwd2[:, None]  # [B,T,2]
  rel_s = look[:, None] - stops.pos[:, :, None]                # [B,S,T,2]
  cy_s, sy_s = jnp.cos(stops.yaw), jnp.sin(stops.yaw)
  lx_s = rel_s[..., 0] * cy_s[..., None] + rel_s[..., 1] * sy_s[..., None]
  ly_s = -rel_s[..., 0] * sy_s[..., None] + rel_s[..., 1] * cy_s[..., None]
  inside_s = (jnp.abs(lx_s) <= stops.extent[..., 0:1]) & \
      (jnp.abs(ly_s) <= stops.extent[..., 1:2])                # [B,S,T]
  targeted = jnp.any(inside_s, -1) & svalid                    # [B,S]
  hit_d = jnp.min(jnp.where(inside_s, t_look[None, None], jnp.inf), -1)
  uncleared = ~ex.cleared_stop_signs
  stopped_now = ego.speed < 0.05     # criterion threshold is 0.1 m/s
  # full stop once the box is within 8 m (braking from the approach's
  # 2 m/s walker speed takes < 1 m); approach at walker speed from 20 m
  stop_sign_hazard = jnp.any(targeted & uncleared & (hit_d < 8.0), -1) \
      & ~stopped_now
  newly_cleared = targeted & uncleared & stopped_now[:, None]
  stop_sign_close = jnp.any(targeted & uncleared, -1)
  # keep the cleared latch while the sign stays nearby (facing-independent
  # so a junction turn right after the stop does not re-arm it)
  cleared = (ex.cleared_stop_signs | newly_cleared) & \
      (stops.valid & (sdist < e.light_radius))

  brake = vehicle_hazard | light_hazard | walker_hazard | stop_sign_hazard

  # --- junction + target speed (autopilot.py:274-283): raster layer OR
  # the compiled route's junction flag at the current route point ---
  junction = maps.sample(scene.town_id[:, None], Layer.JUNCTION,
                         ego.pos[:, None])[:, 0]
  route_junc = jnp.take_along_axis(
      scene.route.is_junction,
      jnp.clip(pl_dense.idx, 0, scene.route.points.shape[1] - 1)[:, None],
      1)[:, 0]
  junction = junction | route_junc
  target_speed = jnp.where(
      walker_close | stop_sign_close, e.target_speed_walker,
      jnp.where(junction, e.target_speed_slow, e.target_speed_fast))

  # --- controllers (autopilot.py:291-298) ---
  pid_speed2, throttle, control_brake = _pid_throttle(
      ex.pid_speed, target_speed, ego.speed, brake, pl_dense.is_last, cfg)
  pid_turn2, steer, angle = _pid_steer(
      ex.pid_turn, ego.pos, ego.yaw, near_target, ego.speed, brake,
      pl_dense.is_last, cfg)
  noise = e.steer_noise * jax.random.normal(rng, steer.shape)
  steer_noisy = steer + noise
  out_brake = (brake | control_brake).astype(jnp.float32)

  # --- sparse command planner advance (autopilot.py:308-323) ---
  pl_sparse = jax.vmap(lambda st, pts, nv, p: planner_step(
      st, pts, _sparse_seg_len(pts, nv), nv, p, _sparse_planner_params(cfg)))(
      ex.planner_sparse, scene.route.sparse_points,
      scene.route.sparse_num_valid, ego.pos)

  new_ex = ExpertState(
      planner_dense=pl_dense, planner_sparse=pl_sparse,
      pid_turn=pid_turn2, pid_speed=pid_speed2,
      steer=steer_noisy, target_speed=target_speed, junction=junction,
      cleared_stop_signs=cleared,
      vehicle_hazard=vehicle_hazard, walker_hazard=walker_hazard,
      light_hazard=light_hazard, stop_sign_hazard=stop_sign_hazard,
      walker_close=walker_close, stop_sign_close=stop_sign_close)
  control = Control(steer=steer_noisy,
                    throttle=jnp.where(brake, 0.0, throttle),
                    brake=out_brake)
  return control, {"expert": new_ex}


def _sparse_seg_len(points: jnp.ndarray, num_valid: jnp.ndarray):
  d = jnp.linalg.norm(jnp.diff(points, axis=0), axis=-1)
  seg = jnp.concatenate([jnp.zeros((1,)), d])
  mask = jnp.arange(points.shape[0]) < num_valid
  return jnp.where(mask, seg, 0.0)
