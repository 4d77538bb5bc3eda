"""Rotating LiDAR raycaster.

Replaces CARLA's ray-cast LiDAR (agent_wrapper_local.py:125-138: 64
channels, range 85 m, FOV +10..-30°, 600k pts/s at 10 Hz rotation, dropoff
model). CARLA emits HALF a rotation per 20 Hz sim tick; the reference
merges two consecutive half-sweeps into one cloud (data_agent.py:201-227).
Here a half sweep is one cast_rays call over a precomputed direction grid,
and the dropoff model is an analytic Bernoulli thinning.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.maps.town_map import MapStack
from carla_garage_tpu.sensors.raycast import cast_rays
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.structs import Scene, SimState

RANGE_M = 85.0
CHANNELS = 64
UPPER_FOV = 10.0
LOWER_FOV = -30.0
DROPOFF_RATE = 0.45          # dropoff_general_rate


def lidar_ray_grid(cfg: GlobalConfig, half: int = 0,
                   decimate: int = 1) -> np.ndarray:
  """Ray directions [C, A, 3] for one half-rotation (half 0: front 180°,
  half 1: rear). Azimuth count matches 600k pts/s / 10 Hz / 64 ch / 2."""
  sc = cfg.sensor
  n_az = sc.lidar_points_per_second // sc.lidar_rotation_frequency \
      // CHANNELS // 2 // decimate
  az0 = -np.pi / 2 if half == 0 else np.pi / 2
  az = az0 + np.pi * (np.arange(n_az) + 0.5) / n_az
  el = np.radians(np.linspace(UPPER_FOV, LOWER_FOV, CHANNELS))
  A, E = np.meshgrid(az, el)
  d = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A),
                np.sin(E)], -1)
  return d.astype(np.float32)


def full_lidar_grid(cfg: GlobalConfig, decimate: int = 1) -> np.ndarray:
  """Both half-rotations concatenated — one full 360° sweep.

  Training renders must use this so the BEV histogram matches what the
  sensor agent builds at inference (live half sweep merged with the
  buffered previous half, sensor_agent.py:358-431 = full coverage);
  training on front-only sweeps leaves the rear half structurally empty
  and puts every inference input out of distribution."""
  return np.concatenate([lidar_ray_grid(cfg, half=0, decimate=decimate),
                         lidar_ray_grid(cfg, half=1, decimate=decimate)],
                        axis=1)


def render_lidar(cfg: GlobalConfig, maps: MapStack, scene: Scene,
                 state: SimState, ray_grid, rng: jnp.ndarray,
                 per_episode: bool = False):
  """One half-sweep -> points [B,N,3] in the EGO frame (LiDAR at
  lidar_pos, config.py:94) + valid mask [B,N] (range + dropoff).

  per_episode=True takes ray_grid as [B,N,3] — a per-episode direction
  set (the sensor agent selects front/rear half by tick parity BEFORE
  casting, halving the raycast work vs rendering both halves)."""
  sc = cfg.sensor
  B = state.ego.yaw.shape[0]
  dirs_local = jnp.asarray(ray_grid) if per_episode \
      else jnp.asarray(ray_grid).reshape(1, -1, 3)
  N = dirs_local.shape[-2]
  yaw = state.ego.yaw[:, None]
  dxy = geo.ego_to_world(dirs_local[..., :2], jnp.zeros((B, 1, 2)), yaw)
  dirs = jnp.concatenate([dxy, jnp.broadcast_to(dirs_local[..., 2:],
                                                (B, N, 1))], -1)
  lid_xy = geo.ego_to_world(jnp.asarray(sc.lidar_pos[:2])[None, None],
                            state.ego.pos[:, None], yaw)
  origins = jnp.concatenate(
      [jnp.broadcast_to(lid_xy, (B, N, 2)),
       jnp.full((B, N, 1), sc.lidar_pos[2])], -1)
  out = cast_rays(cfg, maps, scene, state, origins, dirs,
                  max_range=RANGE_M, need_ground_sem=False)
  depth = out["depth"]
  hit = depth < RANGE_M - 1e-3
  keep = jax.random.uniform(rng, (B, N)) > DROPOFF_RATE
  valid = hit & keep
  # points in ego frame (sensor-relative + sensor mount offset)
  pts_local = dirs_local * depth[..., None]
  pts = pts_local + jnp.asarray([sc.lidar_pos[0], sc.lidar_pos[1],
                                 sc.lidar_pos[2]])
  return pts, valid
