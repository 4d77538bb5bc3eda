"""On-device dataset generation — batched expert rollouts emit training
arrays directly.

The reference farms one CARLA server + DataAgent per SLURM GPU job and
writes jpg/laz/json.gz files at 4 Hz (generate_dataset_slurm.py,
data_agent.py:341-372), later decoded by CPU DataLoader workers
(data.py:238-696). Here datagen IS the env rollout: a scan that advances
the world `save_freq` ticks per iteration and emits one training frame —
world state snapshot + expert labels — as stacked device arrays. Labels
that need the future (waypoints) are computed post-hoc by shifting the
collected trajectory, exactly like data.py:812-838 reads future
measurements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.maps.town_map import LaneGraph, MapStack
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.sim.episode import sim_step
from carla_garage_tpu.sim.route_planner import route_lookup
from carla_garage_tpu.structs import Scene, SimState

SAVE_FREQ = 5            # data_save_freq (config.py:86)
PRED_LEN = 8             # future waypoints (2 s at 4 Hz, config.py:118)


@struct.dataclass
class Frames:
  """Stacked training frames [F,B,...] (F = frames at 4 Hz)."""
  ego_pos: jnp.ndarray       # [F,B,2]
  ego_yaw: jnp.ndarray       # [F,B]
  ego_speed: jnp.ndarray     # [F,B]
  veh_pos: jnp.ndarray       # [F,B,V,2]
  veh_yaw: jnp.ndarray
  veh_speed: jnp.ndarray
  veh_brake: jnp.ndarray
  veh_extent: jnp.ndarray    # [F,B,V,2]
  veh_valid: jnp.ndarray
  wlk_pos: jnp.ndarray       # [F,B,W,2]
  wlk_yaw: jnp.ndarray
  wlk_speed: jnp.ndarray
  wlk_extent: jnp.ndarray
  wlk_valid: jnp.ndarray
  target_point: jnp.ndarray  # [F,B,2] ego frame (sparse route)
  command: jnp.ndarray       # [F,B] int32 navigation command at the TP
  dense_idx: jnp.ndarray     # [F,B] dense-planner pointer
  steer: jnp.ndarray         # [F,B] expert action labels
  throttle: jnp.ndarray
  brake: jnp.ndarray
  target_speed: jnp.ndarray  # [F,B] expert target speed (0 when braking)
  junction: jnp.ndarray      # [F,B]
  light_hazard: jnp.ndarray  # [F,B] expert red-light flag (PlanT input)
  stop_hazard: jnp.ndarray   # [F,B] expert stop-sign flag
  time_s: jnp.ndarray        # [F,B] sim time (recovers light states)
  alive: jnp.ndarray         # [F,B] episode not done at this frame


def collect_expert_frames(cfg: GlobalConfig, maps: MapStack,
                          lanes: LaneGraph, scene: Scene, state: SimState,
                          n_frames: int):
  """Roll the expert for n_frames * SAVE_FREQ ticks, emitting one frame per
  SAVE_FREQ ticks. Returns (final_state, Frames)."""

  def frame_step(st: SimState, _):
    # one traced sim_step inside fori_loop (not unrolled: compile cost)
    st = jax.lax.fori_loop(
        0, SAVE_FREQ, lambda i, s2: sim_step(cfg, maps, lanes, scene, s2),
        st)
    ex = st.expert
    ego = st.ego
    tp_world, tp_cmd = jax.vmap(
        lambda pts, c, nv, i: route_lookup(pts, c, nv, i, 1))(
        scene.route.sparse_points, scene.route.sparse_cmd,
        scene.route.sparse_num_valid, ex.planner_sparse.idx)
    frame = Frames(
        ego_pos=ego.pos, ego_yaw=ego.yaw, ego_speed=ego.speed,
        veh_pos=st.vehicles.pos, veh_yaw=st.vehicles.yaw,
        veh_speed=st.vehicles.speed,
        veh_brake=st.vehicles.control[..., 2],
        veh_extent=st.vehicles.extent, veh_valid=st.vehicles.valid,
        wlk_pos=st.walkers.pos, wlk_yaw=st.walkers.yaw,
        wlk_speed=st.walkers.speed, wlk_extent=st.walkers.extent,
        wlk_valid=st.walkers.valid,
        target_point=geo.world_to_ego(tp_world, ego.pos, ego.yaw),
        command=tp_cmd.astype(jnp.int32),
        dense_idx=ex.planner_dense.idx,
        steer=ex.steer, throttle=jnp.zeros_like(ex.steer),
        brake=(ex.vehicle_hazard | ex.walker_hazard | ex.light_hazard |
               ex.stop_sign_hazard).astype(jnp.float32),
        target_speed=jnp.where(
            ex.vehicle_hazard | ex.walker_hazard | ex.light_hazard |
            ex.stop_sign_hazard, 0.0, ex.target_speed),
        junction=ex.junction,
        light_hazard=ex.light_hazard.astype(jnp.float32),
        stop_hazard=(ex.stop_sign_hazard |
                     ex.stop_sign_close).astype(jnp.float32),
        time_s=st.time_s,
        alive=~st.done)
    return st, frame

  final, frames = jax.lax.scan(frame_step, state, None, length=n_frames)
  return final, frames


def make_dagger_policy(model_policy):
  """Combine a learned policy with the expert into one PolicyFn: the MODEL
  drives (its controls hit the dynamics) while the expert's carry state
  (planners, PID, hazard flags) advances along the visited trajectory.

  Frame recording then reads correct expert labels at every state the
  LEARNED policy reaches — on-policy corrective supervision (DAgger). The
  reference cannot do this (its expert needs a privileged CARLA server
  per route); here both policies are pure functions over the same
  SimState, so querying the expert along the policy's trajectory costs
  one extra forward of the (cheap) expert per tick."""
  from carla_garage_tpu.sim.expert import expert_step

  def pol(cfg, maps, scene, state, rng, params):
    r1, r2 = jax.random.split(rng)
    _, ex_upd = expert_step(cfg, maps, scene, state, r1)
    control, ag_upd = model_policy(cfg, maps, scene, state, r2, params)
    return control, {**ex_upd, **ag_upd}

  return pol


def collect_dagger_frames(cfg: GlobalConfig, maps: MapStack,
                          lanes: LaneGraph, scene: Scene, state: SimState,
                          policy, policy_params, n_frames: int):
  """DAgger datagen: roll the LEARNED policy for n_frames * SAVE_FREQ
  ticks, recording one frame per SAVE_FREQ ticks with EXPERT labels at the
  visited states (state.expert advances via make_dagger_policy).

  The returned Frames are label-correct for route-relative supervision
  (target_speed class, checkpoints, hazard flags, CenterNet objects).
  Waypoint labels (future EGO positions) reflect the policy's own — often
  wrong — trajectory: weigh the wp loss 0 for these frames."""
  combined = make_dagger_policy(policy)

  def frame_step(st: SimState, _):
    st = jax.lax.fori_loop(
        0, SAVE_FREQ,
        lambda i, s2: sim_step(cfg, maps, lanes, scene, s2,
                               policy=combined,
                               policy_params=policy_params),
        st)
    return st, _record_frame(cfg, scene, st)

  final, frames = jax.lax.scan(frame_step, state, None, length=n_frames)
  return final, frames


def _record_frame(cfg: GlobalConfig, scene: Scene, st: SimState) -> Frames:
  """Snapshot one training frame (shared by expert and DAgger collectors)."""
  ex = st.expert
  ego = st.ego
  tp_world, tp_cmd = jax.vmap(
      lambda pts, c, nv, i: route_lookup(pts, c, nv, i, 1))(
      scene.route.sparse_points, scene.route.sparse_cmd,
      scene.route.sparse_num_valid, ex.planner_sparse.idx)
  return Frames(
      ego_pos=ego.pos, ego_yaw=ego.yaw, ego_speed=ego.speed,
      veh_pos=st.vehicles.pos, veh_yaw=st.vehicles.yaw,
      veh_speed=st.vehicles.speed,
      veh_brake=st.vehicles.control[..., 2],
      veh_extent=st.vehicles.extent, veh_valid=st.vehicles.valid,
      wlk_pos=st.walkers.pos, wlk_yaw=st.walkers.yaw,
      wlk_speed=st.walkers.speed, wlk_extent=st.walkers.extent,
      wlk_valid=st.walkers.valid,
      target_point=geo.world_to_ego(tp_world, ego.pos, ego.yaw),
      command=tp_cmd.astype(jnp.int32),
      dense_idx=ex.planner_dense.idx,
      steer=ex.steer, throttle=jnp.zeros_like(ex.steer),
      brake=(ex.vehicle_hazard | ex.walker_hazard | ex.light_hazard |
             ex.stop_sign_hazard).astype(jnp.float32),
      target_speed=jnp.where(
          ex.vehicle_hazard | ex.walker_hazard | ex.light_hazard |
          ex.stop_sign_hazard, 0.0, ex.target_speed),
      junction=ex.junction,
      light_hazard=ex.light_hazard.astype(jnp.float32),
      stop_hazard=(ex.stop_sign_hazard |
                   ex.stop_sign_close).astype(jnp.float32),
      time_s=st.time_s,
      alive=~st.done)


def export_frames_jsonl(frames: Frames, path: str, episode: int = 0):
  """Write one episode's frame log as JSONL — the ScenarioLogger analog
  (team_code/scenario_logger.py: per-frame ego/traffic state for replay).
  The visualization module renders these into trajectory maps."""
  import gzip
  import json
  import numpy as np
  op = gzip.open if path.endswith(".gz") else open
  F = frames.ego_pos.shape[0]
  with op(path, "wt") as f:
    for t in range(F):
      if not bool(frames.alive[t, episode]):
        break
      rec = {
          "frame": t,
          "ego": {"pos": np.asarray(frames.ego_pos[t, episode]).tolist(),
                  "yaw": float(frames.ego_yaw[t, episode]),
                  "speed": float(frames.ego_speed[t, episode]),
                  "steer": float(frames.steer[t, episode]),
                  "brake": float(frames.brake[t, episode])},
          "vehicles": [
              {"pos": np.asarray(frames.veh_pos[t, episode, v]).tolist(),
               "yaw": float(frames.veh_yaw[t, episode, v]),
               "speed": float(frames.veh_speed[t, episode, v])}
              for v in range(frames.veh_yaw.shape[2])
              if bool(frames.veh_valid[t, episode, v])],
          "walkers": [
              {"pos": np.asarray(frames.wlk_pos[t, episode, w]).tolist()}
              for w in range(frames.wlk_yaw.shape[2])
              if bool(frames.wlk_valid[t, episode, w])],
      }
      f.write(json.dumps(rec) + "\n")


def checkpoint_labels(frames: Frames, scene, n_ckpt: int,
                      spacing: int = 2):
  """Future route checkpoints in each frame's ego frame (the reference's
  smoothed route labels, data.py:1066-1138). [F,B,n_ckpt,2]."""
  F, B = frames.ego_yaw.shape
  R = scene.route.points.shape[1]
  offs = (jnp.arange(n_ckpt) + 1) * spacing
  q = jnp.clip(frames.dense_idx[..., None] + offs, 0, R - 1)   # [F,B,n]
  pts = jnp.take_along_axis(
      jnp.broadcast_to(scene.route.points[None], (F, B, R, 2)),
      q[..., None], 2)
  return geo.world_to_ego(pts, frames.ego_pos[:, :, None],
                          frames.ego_yaw[:, :, None])


def waypoint_labels(frames: Frames):
  """Future ego positions in each frame's ego coordinates
  (data.py:812-838 semantics): label[t, k] = pose(t+k+1) in frame(t),
  k = 0..PRED_LEN-1. Frames within PRED_LEN of the end are masked.

  Returns (wp [F,B,PRED_LEN,2], valid [F,B])."""
  F = frames.ego_pos.shape[0]

  def label_at(k):
    fut = jnp.roll(frames.ego_pos, -(k + 1), axis=0)       # [F,B,2]
    return geo.world_to_ego(fut, frames.ego_pos, frames.ego_yaw)

  wp = jnp.stack([label_at(k) for k in range(PRED_LEN)], axis=2)
  idx = jnp.arange(F)
  has_future = idx < (F - PRED_LEN)
  fut_alive = jnp.roll(frames.alive, -PRED_LEN, axis=0)
  valid = frames.alive & fut_alive & has_future[:, None]
  return wp, valid


def target_speed_labels(frames: Frames, cfg: GlobalConfig,
                        brake_lookahead: int = 0):
  """Class index 0..3 (0 = brake; bins at walker/slow/fast + 0.1,
  config.py:144-148).

  brake_lookahead > 0 labels brake if the expert brakes within the next k
  frames — anticipatory supervision matching the expert's own forecast
  horizon (forcast_time 0.5 s, config.py:544), which sharpens closed-loop
  hazard braking."""
  e = cfg.expert
  ts = frames.target_speed
  braking = frames.brake > 0.5
  for k in range(1, brake_lookahead + 1):
    braking = braking | (jnp.roll(frames.brake, -k, axis=0) > 0.5)
  cls = jnp.where(ts <= e.target_speed_walker + 0.1, 1,
                  jnp.where(ts <= e.target_speed_slow + 0.1, 2, 3))
  return jnp.where(braking | (ts <= 0.01), 0, cls).astype(jnp.int32)
