"""BEV semantic rasterizer — the birds_eye_view/ObsManager as array ops.

The reference renders 11-class BEV ground-truth with OpenCV affine warps of
pre-rasterized town maps plus fillConvexPoly for actors
(chauffeurnet.py:252-264; classes from config.py:420-432). Here the warp is a
gather (sample the town raster at rotated ego-frame pixel coordinates) and
polygon fill is a batched point-in-OBB test — one fused XLA program per
frame, vmappable over the episode batch.

Class ids (config.py bev_converter):
  0 unlabeled, 1 road, 2 sidewalk, 3 lane marking, 4 broken lane marking,
  5 stop sign, 6 light green, 7 light yellow, 8 light red,
  9 vehicle, 10 walker.

Grid convention: [H,W] with x (forward) increasing along columns and y
(right) along rows, ego at the grid center; extent ±32 m at 4 px/m
(config.py:119-141) — matching the LiDAR BEV voxel grid so the two align
channel-wise for the sensor fusion models.
"""

from __future__ import annotations

import jax.numpy as jnp

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.maps.town_map import Layer, MapStack
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.structs import LightState, Scene, SimState


class BevClass:
  UNLABELED = 0
  ROAD = 1
  SIDEWALK = 2
  LANE_MARKING = 3
  LANE_MARKING_BROKEN = 4
  STOP_SIGN = 5
  LIGHT_GREEN = 6
  LIGHT_YELLOW = 7
  LIGHT_RED = 8
  VEHICLE = 9
  WALKER = 10
  NUM = 11


def bev_grid_world(cfg: GlobalConfig, ego_pos: jnp.ndarray,
                   ego_yaw: jnp.ndarray) -> jnp.ndarray:
  """World coordinates [H,W,2] of each BEV pixel for one ego pose."""
  sc = cfg.sensor
  H, W = sc.lidar_resolution_height, sc.lidar_resolution_width
  xs = (jnp.arange(W) + 0.5) / sc.pixels_per_meter + sc.min_x   # forward
  ys = (jnp.arange(H) + 0.5) / sc.pixels_per_meter + sc.min_y   # right
  local = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)    # [H,W,2]
  return geo.ego_to_world(local, ego_pos, ego_yaw)


def render_bev_semantics(cfg: GlobalConfig, maps: MapStack, scene: Scene,
                         state: SimState) -> jnp.ndarray:
  """[B,H,W] uint8 class map for the whole batch."""
  sc = cfg.sensor
  B = state.ego.yaw.shape[0]
  H, W = sc.lidar_resolution_height, sc.lidar_resolution_width

  # world position of every pixel, [B,H,W,2]
  grid = bev_grid_world(cfg, state.ego.pos[:, None, None],
                        state.ego.yaw[:, None, None])
  town = scene.town_id[:, None, None]

  out = jnp.zeros((B, H, W), jnp.uint8)

  def paint(canvas, mask, cls):
    return jnp.where(mask, jnp.uint8(cls), canvas)

  # static layers, lowest priority first (chauffeurnet composite :252-261)
  out = paint(out, maps.sample(town, Layer.ROAD, grid), BevClass.ROAD)
  out = paint(out, maps.sample(town, Layer.SIDEWALK, grid),
              BevClass.SIDEWALK)
  out = paint(out, maps.sample(town, Layer.LANE_MARKING_ALL, grid),
              BevClass.LANE_MARKING)
  out = paint(out, maps.sample(town, Layer.LANE_MARKING_BROKEN, grid),
              BevClass.LANE_MARKING_BROKEN)

  # stop-sign trigger boxes
  stops = scene.stops
  in_stop = geo.point_in_obb(grid[:, :, :, None], stops.pos[:, None, None],
                             stops.yaw[:, None, None],
                             stops.extent[:, None, None])
  out = paint(out, jnp.any(in_stop & stops.valid[:, None, None], -1),
              BevClass.STOP_SIGN)

  # traffic-light stop lines colored by state (traffic_light.py:12-40)
  lights = scene.lights
  lstate = lights.state_at(state.time_s)                       # [B,L]
  in_light = geo.point_in_obb(grid[:, :, :, None], lights.pos[:, None, None],
                              lights.yaw[:, None, None],
                              lights.extent[:, None, None])
  in_light &= lights.valid[:, None, None]
  for ls, cls in ((LightState.GREEN, BevClass.LIGHT_GREEN),
                  (LightState.YELLOW, BevClass.LIGHT_YELLOW),
                  (LightState.RED, BevClass.LIGHT_RED)):
    m = jnp.any(in_light & (lstate == ls)[:, None, None], -1)
    out = paint(out, m, cls)

  # actors
  veh = state.vehicles
  in_veh = geo.point_in_obb(grid[:, :, :, None], veh.pos[:, None, None],
                            veh.yaw[:, None, None],
                            veh.extent[:, None, None])
  out = paint(out, jnp.any(in_veh & veh.valid[:, None, None], -1),
              BevClass.VEHICLE)
  wlk = state.walkers
  in_wlk = geo.point_in_obb(grid[:, :, :, None], wlk.pos[:, None, None],
                            wlk.yaw[:, None, None],
                            wlk.extent[:, None, None])
  out = paint(out, jnp.any(in_wlk & wlk.valid[:, None, None], -1),
              BevClass.WALKER)
  return out
