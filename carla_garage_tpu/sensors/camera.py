"""Pinhole camera rendering: RGB / semantic / depth from the analytic scene.

Replaces CARLA's UE4 camera (config.py:100-106: 1024×256, FOV 110, mounted
at (-1.5, 0, 2.0)). The ray grid is a compile-time constant; rendering is
one cast_rays call per frame. RGB is synthesized from the semantic palette
with distance shading + light-state coloring — self-consistent imagery for
policies trained inside this simulator (checkpoint-level parity with UE4
pixels is out of scope per SURVEY.md §7 risks).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.maps.town_map import MapStack
from carla_garage_tpu.sensors.raycast import Sem, cast_rays
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.structs import Scene, SimState

# BGR->RGB of config.py:385-393 classes_list, extended with render-only
# light-state colors (rows 7/8): the UE4 camera shows the lit bulb, which
# is the only non-privileged red-vs-green cue — state-blind RGB makes
# red-light compliance unlearnable (Sem.LIGHT_GREEN/LIGHT_YELLOW).
PALETTE = np.array([
    [0, 0, 0],          # unlabeled / sky
    [30, 170, 250],     # vehicle
    [200, 200, 200],    # road
    [255, 40, 20],      # traffic light — RED state
    [220, 20, 60],      # pedestrian (CARLA crimson — distinct from the
                        # green-light color below)
    [0, 255, 255],      # road line
    [255, 255, 255],    # sidewalk
    [40, 255, 70],      # traffic light — GREEN state (render-only class)
    [255, 210, 40],     # traffic light — YELLOW state (render-only class)
], np.float32) / 255.0


def camera_ray_grid(cfg: GlobalConfig, scale: int = 1) -> np.ndarray:
  """Unit ray directions [H,W,3] in the camera (=ego, yaw 0) frame."""
  sc = cfg.sensor
  H, W = sc.camera_height // scale, sc.camera_width // scale
  f = sc.camera_width / (2.0 * np.tan(np.radians(sc.camera_fov) / 2.0))
  us = (np.arange(W) + 0.5) * scale - sc.camera_width / 2.0
  vs = (np.arange(H) + 0.5) * scale - sc.camera_height / 2.0
  uu, vv = np.meshgrid(us, vs)
  d = np.stack([np.full_like(uu, f), uu, -vv], -1)   # x fwd, y right, z up
  return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def render_camera(cfg: GlobalConfig, maps: MapStack, scene: Scene,
                  state: SimState, ray_grid: np.ndarray):
  """-> dict(rgb [B,H,W,3] f32 0..1, semantic [B,H,W] i32, depth [B,H,W])."""
  sc = cfg.sensor
  H, W = ray_grid.shape[:2]
  B = state.ego.yaw.shape[0]
  dirs_local = jnp.asarray(ray_grid).reshape(1, -1, 3)

  # rotate rays into world frame by ego yaw; camera offset from ego center
  yaw = state.ego.yaw[:, None]
  dxy = geo.ego_to_world(dirs_local[..., :2],
                         jnp.zeros((B, 1, 2)), yaw)
  dirs = jnp.concatenate([dxy, jnp.broadcast_to(dirs_local[..., 2:],
                                                (B, dxy.shape[1], 1))], -1)
  cam_off = jnp.asarray(sc.camera_pos[:2])
  cam_xy = geo.ego_to_world(cam_off[None, None], state.ego.pos[:, None], yaw)
  origins = jnp.concatenate(
      [jnp.broadcast_to(cam_xy, (B, dxy.shape[1], 2)),
       jnp.full((B, dxy.shape[1], 1), sc.camera_pos[2])], -1)

  out = cast_rays(cfg, maps, scene, state, origins, dirs,
                  grid_hw=(H, W), ground_subsample=4)
  sem_render = out["sem"].reshape(B, H, W)
  depth = out["depth"].reshape(B, H, W)
  shade = 1.0 / (1.0 + 0.02 * depth)
  # palette lookup as one-hot matmul: a per-pixel gather costs ~12 ns/elem
  # on TPU; one_hot+matmul rides the MXU instead
  import jax
  rgb = jax.nn.one_hot(sem_render, PALETTE.shape[0],
                       dtype=jnp.float32) @ jnp.asarray(PALETTE)
  rgb = rgb * shade[..., None]
  # the 7-class SEMANTIC label keeps the reference taxonomy: all light
  # states collapse to Sem.LIGHT (state shows in RGB only, like UE4)
  sem = jnp.where(sem_render >= Sem.LIGHT_GREEN, Sem.LIGHT, sem_render)
  return {"rgb": rgb, "semantic": sem, "depth": depth}
