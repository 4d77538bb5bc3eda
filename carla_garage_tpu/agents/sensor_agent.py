"""Sensor agent — TransFuser++ (or AIM) driving from rendered sensors.

Re-design of team_code/sensor_agent.py:49-746 (§3.2 call stack): per tick —
noisy GNSS -> UKF predict/update -> route planners -> camera render ->
LiDAR half-sweep render + merge with the previous half-sweep -> voxelize ->
model forward -> PID control, plus the stuck/creep recovery logic
(sensor_agent.py:561-599). Everything, model included, runs inside the
jitted env step, so a full benchmark of sensor-driven episodes is one XLA
program.

Parity features: ensemble averaging (params may be a list of weight
pytrees, averaged like sensor_agent.py:114-131/:487-495), jpg-artifact
emulation (jpeg_quality wires ops/jpeg.py for jpg-trained checkpoints,
:277-279), temporal LiDAR buffering (seq_len > 1), the MAP-track variant
(map_track=True), the detected-stop-sign controller (stop_control=True)
and the LiDAR-safety-box creep recovery (:561-599).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from carla_garage_tpu.agents.controllers import control_pid, control_pid_direct
from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.models.transfuser import LidarCenterNet, TransfuserConfig
from carla_garage_tpu.sensors.camera import render_camera
from carla_garage_tpu.sensors.lidar import render_lidar
from carla_garage_tpu.sensors.voxelize import voxelize, voxelize_matmul
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.sim.expert import (Control, _dense_planner_params,
                                         _sparse_planner_params,
                                         _sparse_seg_len)
from carla_garage_tpu.sim.route_planner import planner_step, route_lookup
from carla_garage_tpu.sim.ukf import (UKFState, ukf_predict, ukf_reset,
                                      ukf_update)
from carla_garage_tpu.structs import (Cmd, PIDState, PlannerState, Scene,
                                      SimState)

GNSS_NOISE_M = 0.55          # 5e-6 deg lat/lon stddev * earth scale
COMPASS_NOISE = 0.001


@struct.dataclass
class SensorAgentState:
  ukf: UKFState
  planner_dense: PlannerState
  planner_sparse: PlannerState
  pid_turn: PIDState
  pid_speed: PIDState
  prev_control: jnp.ndarray      # [B,3] steer/throttle/brake last applied
  prev_lidar: jnp.ndarray        # [B,K,N,3] buffer of past half-sweeps
  prev_lidar_valid: jnp.ndarray  # [B,K,N] (K = 1 + extra temporal sweeps)
  prev_pose: jnp.ndarray         # [B,K,3] filtered (x,y,yaw) per sweep
  stuck_count: jnp.ndarray       # [B] int32
  force_move: jnp.ndarray        # [B] int32 remaining creep frames
  # detected-stop-sign controller (sensor_agent.py:617-657): one tracked
  # stop-sign detection in the CURRENT ego frame + the post-clear cooldown
  stop_box: jnp.ndarray          # [B,5] x,y,ex,ey,yaw
  stop_box_valid: jnp.ndarray    # [B] bool
  clear_stop: jnp.ndarray        # [B] int32 cooldown ticks


def sensor_agent_reset(cfg: GlobalConfig, B: int, n_lidar: int,
                       seq_len: int = 1) -> SensorAgentState:
  """seq_len > 1 keeps a temporal buffer of that many past half-sweeps
  (sensor_agent.py:358-431 lidar buffer semantics)."""
  K = max(seq_len, 1)
  return SensorAgentState(
      ukf=ukf_reset(B),
      planner_dense=PlannerState(idx=jnp.zeros((B,), jnp.int32),
                                 is_last=jnp.zeros((B,), bool)),
      planner_sparse=PlannerState(idx=jnp.zeros((B,), jnp.int32),
                                  is_last=jnp.zeros((B,), bool)),
      pid_turn=PIDState.create((B,), cfg.expert.turn_n),
      pid_speed=PIDState.create((B,), cfg.expert.speed_n),
      prev_control=jnp.zeros((B, 3)),
      prev_lidar=jnp.zeros((B, K, n_lidar, 3)),
      prev_lidar_valid=jnp.zeros((B, K, n_lidar), bool),
      prev_pose=jnp.zeros((B, K, 3)),
      stuck_count=jnp.zeros((B,), jnp.int32),
      force_move=jnp.zeros((B,), jnp.int32),
      stop_box=jnp.zeros((B, 5)),
      stop_box_valid=jnp.zeros((B,), bool),
      clear_stop=jnp.zeros((B,), jnp.int32))


def command_onehot(cmd: jnp.ndarray) -> jnp.ndarray:
  """6-way one-hot of RoadOption values 1..6 (transfuser_utils.py:507)."""
  return jax.nn.one_hot(jnp.clip(cmd, 1, 6) - 1, 6)


def make_transfuser_policy(model: LidarCenterNet, params,
                           tcfg: TransfuserConfig, camera_grid,
                           lidar_grid_front, lidar_grid_rear,
                           direct: bool = True, map_track: bool = False,
                           uncertainty_weight: bool = True,
                           brake_threshold: float = 0.5,
                           stop_control: bool = False,
                           bf16: bool = False,
                           jpeg_quality: int | None = None):
  """PolicyFn: full sensor pipeline + model + control, jitted in the step.

  direct=True uses the classified-target-speed + checkpoint-angle
  controller (inference_direct_controller / DIRECT=1 operating point),
  else the waypoint controller.

  map_track=True replaces the predicted path with the HD-map route
  checkpoint (the MapAgent variant, map_agent.py:1-60).

  uncertainty_weight / brake_threshold mirror the published operating
  points (sensor_agent.py:544-552; README.md:82-84 —
  UNCERTAINTY_THRESHOLD=0.33 is the Longest6 point): weighted expectation
  of the speed classes with a brake-probability override, else argmax.

  stop_control=True enables the detected-stop-sign controller
  (sensor_agent.py:617-657, the LAV operating point STOP_CONTROL=1): the
  agent tracks its own class-3 CenterNet detection and forces a full stop
  inside it before proceeding.

  `params` may be a single param pytree or a LIST of pytrees — an ensemble
  whose outputs are averaged (sensor_agent.py:114-131, :487-495). It may
  also be None: then the weights MUST be supplied at call time through the
  rollout functions' `policy_params` argument, which keeps them out of the
  jitted program's constants (multi-MB weight constants make remote XLA
  compiles pathological — pass them as args).
  """
  target_speeds = jnp.array([0.0, 2.0, 5.0, 8.0])   # config.py:148

  def policy(cfg: GlobalConfig, maps, scene: Scene, state: SimState, rng,
             params_rt=None):
    p_in = params_rt if params_rt is not None else params
    param_list = p_in if isinstance(p_in, (list, tuple)) else [p_in]
    ag: SensorAgentState = state.agent
    ego = state.ego
    B = ego.yaw.shape[0]
    r_gps, r_cmp, r_lid = jax.random.split(rng, 3)

    # --- localization: noisy GNSS/compass -> UKF (sensor_agent.py:288-307)
    gps = ego.pos + GNSS_NOISE_M * jax.random.normal(r_gps, (B, 2))
    compass = ego.yaw + COMPASS_NOISE * jax.random.normal(r_cmp, (B,))
    ukf = ukf_predict(ag.ukf, ag.prev_control[:, 0], ag.prev_control[:, 1],
                      ag.prev_control[:, 2], cfg.sim)
    z = jnp.stack([gps[:, 0], gps[:, 1], compass, ego.speed], -1)
    ukf = ukf_update(ukf, z)
    pos_f = ukf.x[:, :2]
    yaw_f = ukf.x[:, 2]

    # --- route planners on the filtered pose ---
    pl_dense = jax.vmap(lambda st, pts, sl, nv, p: planner_step(
        st, pts, sl, nv, p, _dense_planner_params(cfg)))(
        ag.planner_dense, scene.route.points, scene.route.seg_len,
        scene.route.num_valid, pos_f)
    pl_sparse = jax.vmap(lambda st, pts, nv, p: planner_step(
        st, pts, _sparse_seg_len(pts, nv), nv, p,
        _sparse_planner_params(cfg)))(
        ag.planner_sparse, scene.route.sparse_points,
        scene.route.sparse_num_valid, pos_f)
    tp_world, cmd = jax.vmap(
        lambda pts, c, nv, i: route_lookup(pts, c, nv, i, 1))(
        scene.route.sparse_points, scene.route.sparse_cmd,
        scene.route.sparse_num_valid, pl_sparse.idx)
    target_point = geo.world_to_ego(tp_world, pos_f, yaw_f)

    # --- sensors ---
    cam = render_camera(cfg, maps, scene, state, camera_grid)
    if jpeg_quality is not None:
      # jpg-artifact conditioning for checkpoints trained on jpg-stored
      # data (sensor_agent.py:277-279 re-encodes the live camera at test
      # time; cv2's default quality is 95)
      from carla_garage_tpu.ops.jpeg import jpeg_artifacts
      cam = dict(cam, rgb=jpeg_artifacts(cam["rgb"],
                                         quality=jpeg_quality))
    # alternate front/rear half sweeps by tick parity (CARLA semantics) —
    # the half is selected BEFORE the cast (one raycast, not two)
    even = (state.tick % 2 == 0)[:, None]
    g_front = jnp.asarray(lidar_grid_front).reshape(-1, 3)
    g_rear = jnp.asarray(lidar_grid_rear).reshape(-1, 3)
    grid_sel = jnp.where(even[..., None], g_front[None], g_rear[None])
    pts_now, val_now = render_lidar(cfg, maps, scene, state, grid_sel,
                                    r_lid, per_episode=True)
    # realign the buffered past half sweeps into the current ego frame
    # (transfuser_utils.align_lidar:116-131 via the filtered pose log;
    # K > 1 is the temporal-LiDAR buffer of sensor_agent.py:358-431)
    K = ag.prev_lidar.shape[1]
    prev_pts_world = geo.ego_to_world(ag.prev_lidar[..., :2],
                                      ag.prev_pose[:, :, None, :2],
                                      ag.prev_pose[:, :, 2][:, :, None])
    prev_in_cur = geo.world_to_ego(prev_pts_world, pos_f[:, None, None],
                                   yaw_f[:, None, None])
    prev_pts = jnp.concatenate([prev_in_cur, ag.prev_lidar[..., 2:]], -1)
    # newest buffered sweep merges with the live one (the standard 2-half
    # merge); older sweeps voxelize into extra channel pairs
    merged_pts = jnp.concatenate([pts_now, prev_pts[:, 0]], 1)
    merged_val = jnp.concatenate([val_now, ag.prev_lidar_valid[:, 0]], 1)
    lidar_bev = jax.vmap(lambda p, v: voxelize_matmul(p, v, cfg))(
        merged_pts, merged_val)                       # [B,2,H,W]
    if K > 1:
      older = [jax.vmap(lambda p, v: voxelize_matmul(p, v, cfg))(
          prev_pts[:, k], ag.prev_lidar_valid[:, k]) for k in range(1, K)]
      lidar_bev = jnp.concatenate([lidar_bev] + older, 1)
    lidar_bev = jnp.transpose(lidar_bev, (0, 2, 3, 1))

    # --- model forward (ensemble-averaged, inside the env step).
    # bf16=True runs the forward in bfloat16 (params + activations; heads
    # return bf16 logits cast back) — the MXU-native inference precision.
    def fwd(p):
      if bf16:
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        o = model.apply(cast(p), cast(cam["rgb"]), cast(lidar_bev),
                        cast(target_point), cast(command_onehot(cmd)),
                        cast(ego.speed))
        return jax.tree.map(lambda x: x.astype(jnp.float32), o)
      return model.apply(p, cam["rgb"], lidar_bev, target_point,
                         command_onehot(cmd), ego.speed)

    outs = [fwd(p) for p in param_list]
    out = jax.tree.map(lambda *xs: sum(xs) / len(xs), *outs)

    # --- control (sensor_agent.py:544-557 + model.py:461-554) ---
    if direct:
      probs = jax.nn.softmax(out["pred_target_speed"])
      if uncertainty_weight:
        ts = jnp.sum(probs * target_speeds, -1)       # expectation
        ts = jnp.where(probs[:, 0] > brake_threshold, 0.0, ts)
      else:
        ts = target_speeds[jnp.argmax(probs, -1)]
      if map_track:
        # MAP track: aim at the HD-map route point ahead (MapAgent)
        aim_world, _ = jax.vmap(
            lambda pts, c, nv, i: route_lookup(pts, c, nv, i, 4))(
            scene.route.points, scene.route.cmd, scene.route.num_valid,
            pl_dense.idx)
        aim = geo.world_to_ego(aim_world, pos_f, yaw_f)
      else:
        ckpt = out["pred_checkpoint"]
        aim = ckpt[:, 2]                              # ~2nd checkpoint aim
      angle = jnp.degrees(jnp.arctan2(aim[:, 1], aim[:, 0])) / 90.0
      steer, throttle, brake, pt2, ps2 = control_pid_direct(
          ag.pid_turn, ag.pid_speed, ts, angle, ego.speed, cfg)
    else:
      steer, throttle, brake, pt2, ps2 = control_pid(
          ag.pid_turn, ag.pid_speed, out["pred_wp"], ego.speed, cfg)

    # --- stuck -> creep recovery (sensor_agent.py:561-599) ---
    stuck = jnp.where(ego.speed < 0.1, ag.stuck_count + 1, 0)
    start_creep = stuck > cfg.expert.stuck_threshold
    force = jnp.where(start_creep, cfg.expert.creep_duration,
                      jnp.maximum(ag.force_move - 1, 0))
    # LiDAR safety box (sensor_agent.py:571-599 + ref config.py:513-519):
    # any sweep return in the box directly ahead blocks the creep with a
    # full brake — without this gate the recovery rams a stopped leader
    # the moment the stuck timer expires.
    s = cfg.sim
    in_box = (merged_val &
              (merged_pts[..., 0] > s.ego_extent_x) &
              (merged_pts[..., 0] < s.ego_extent_x + 2.5) &
              (jnp.abs(merged_pts[..., 1]) < s.ego_extent_y * 0.8) &
              (merged_pts[..., 2] > 0.5) & (merged_pts[..., 2] < 1.5))
    obstructed = jnp.any(in_box, axis=-1)
    creeping = (force > 0) & ~obstructed
    # an obstructed creep re-arms for when the box clears (ref :599)
    force = jnp.where((force > 0) & obstructed,
                      cfg.expert.creep_duration, force)
    throttle = jnp.where(creeping, cfg.expert.creep_throttle, throttle)
    brake = jnp.where(creeping, 0.0,
                      jnp.where((force > 0) & obstructed, 1.0, brake))
    stuck = jnp.where(creeping, 0, stuck)

    # --- detected-stop-sign controller (sensor_agent.py:617-657) ---
    stop_box, stop_valid, clear_stop = ag.stop_box, ag.stop_box_valid, \
        ag.clear_stop
    if stop_control and "pred_bb" in out:
      from carla_garage_tpu.ops.detection import topk_decode
      grid_h = out["pred_bb"]["heatmap"].shape[1]
      ppm_grid = grid_h / (cfg.sensor.max_y - cfg.sensor.min_y)
      det = topk_decode(out["pred_bb"], ppm=ppm_grid, k=20,
                        min_x=cfg.sensor.min_x, min_y=cfg.sensor.min_y)
      # transform the carried box into the current ego frame via the
      # filtered pose delta (bb_buffer realignment)
      prev_p = ag.prev_pose[:, 0]
      bw = geo.ego_to_world(stop_box[:, :2], prev_p[:, :2], prev_p[:, 2])
      bcur = geo.world_to_ego(bw, pos_f, yaw_f)
      byaw = geo.normalize_angle(stop_box[:, 4] + prev_p[:, 2] - yaw_f)
      stop_box = jnp.concatenate([bcur, stop_box[:, 2:4],
                                  byaw[:, None]], -1)
      # adopt the best fresh class-3 detection when not tracking one
      is_stop = (det["cls"] == 3) & (det["score"] > 0.3)
      d2 = jnp.where(is_stop, det["x"] ** 2 + det["y"] ** 2, jnp.inf)
      bi = jnp.argmin(d2, -1)
      take = lambda a: jnp.take_along_axis(a, bi[:, None], 1)[:, 0]
      fresh = jnp.stack([take(det["x"]), take(det["y"]),
                         take(det["l"]) / 2, take(det["w"]) / 2,
                         take(det["yaw"])], -1)
      has_fresh = jnp.isfinite(jnp.take_along_axis(d2, bi[:, None], 1)[:, 0])
      adopt = has_fresh & ~stop_valid
      stop_box = jnp.where(adopt[:, None], fresh, stop_box)
      stop_valid = stop_valid | adopt
      # drop once it leaves the observable range
      stop_valid &= jnp.linalg.norm(stop_box[:, :2], axis=-1) < \
          cfg.sensor.max_x
      # intersect test against the ego box at the origin
      ego_e = jnp.array([cfg.sim.ego_extent_x, cfg.sim.ego_extent_y])
      inter = geo.obb_intersect(
          jnp.zeros_like(stop_box[:, :2])[:, None],
          jnp.zeros_like(stop_box[:, 4])[:, None], ego_e[None, None],
          stop_box[None, :, :2].swapaxes(0, 1),
          stop_box[None, :, 4].swapaxes(0, 1),
          jnp.maximum(stop_box[None, :, 2:4].swapaxes(0, 1), 0.5))[:, 0]
      active = stop_valid & inter & (clear_stop <= 0)
      must_stop = active & (ego.speed > 0.01)
      cleared = active & (ego.speed <= 0.01)
      stop_valid &= ~cleared
      clear_stop = jnp.where(cleared, 100,
                             jnp.maximum(clear_stop - 1, 0))
      throttle = jnp.where(must_stop, 0.0, throttle)
      brake = jnp.where(must_stop, 1.0, brake)

    control = Control(steer=steer, throttle=throttle, brake=brake)
    new_pose = jnp.stack([pos_f[:, 0], pos_f[:, 1], yaw_f], -1)
    new_ag = SensorAgentState(
        ukf=ukf, planner_dense=pl_dense, planner_sparse=pl_sparse,
        pid_turn=pt2, pid_speed=ps2,
        prev_control=jnp.stack([steer, throttle, brake], -1),
        prev_lidar=jnp.concatenate(
            [pts_now[:, None], ag.prev_lidar[:, :-1]], 1),
        prev_lidar_valid=jnp.concatenate(
            [val_now[:, None], ag.prev_lidar_valid[:, :-1]], 1),
        prev_pose=jnp.concatenate(
            [new_pose[:, None], ag.prev_pose[:, :-1]], 1),
        stuck_count=stuck.astype(jnp.int32),
        force_move=force.astype(jnp.int32),
        stop_box=stop_box, stop_box_valid=stop_valid,
        clear_stop=clear_stop.astype(jnp.int32))
    return control, {"agent": new_ag}

  return policy
