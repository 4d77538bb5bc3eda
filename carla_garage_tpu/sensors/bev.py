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
from carla_garage_tpu.ops.pallas.bev_fill import fill_boxes_bev
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


def _boxes_to_grid(cfg: GlobalConfig, state: SimState, pos, yaw, extent,
                   valid, cls):
  """World OBBs -> (cx, cy, yaw, ex, ey, cls, valid) in BEV grid-pixel
  units for the Pallas fill kernel (grid frame = ego frame scaled by ppm:
  x/forward along columns, y/right along rows)."""
  sc = cfg.sensor
  rel = geo.world_to_ego(pos, state.ego.pos[:, None], state.ego.yaw[:, None])
  ryaw = yaw - state.ego.yaw[:, None]
  cx = (rel[..., 0] - sc.min_x) * sc.pixels_per_meter - 0.5
  cy = (rel[..., 1] - sc.min_y) * sc.pixels_per_meter - 0.5
  ex = extent[..., 0] * sc.pixels_per_meter
  ey = extent[..., 1] * sc.pixels_per_meter
  return cx, cy, ryaw, ex, ey, cls, valid


def render_bev_semantics(cfg: GlobalConfig, maps: MapStack, scene: Scene,
                         state: SimState) -> jnp.ndarray:
  """[B,H,W] uint8 class map for the whole batch.

  Static layers are a gather (the affine-warp half of chauffeurnet's
  renderer); actor/trigger boxes go through the Pallas fill kernel
  (ops/pallas/bev_fill.py — the fillConvexPoly half). Priority follows the
  chauffeurnet composite :252-261: later box groups overwrite earlier ones.
  TPU timing (B=32, 256², 104 boxes): kernel ≈ dense point-in-OBB within
  noise at this box count — the win is VMEM footprint (no [B,H,W,V]
  broadcast), which is what frees room for bigger batches."""
  sc = cfg.sensor
  B = state.ego.yaw.shape[0]
  H, W = sc.lidar_resolution_height, sc.lidar_resolution_width

  # world position of every pixel, [B,H,W,2]
  grid = bev_grid_world(cfg, state.ego.pos[:, None, None],
                        state.ego.yaw[:, None, None])

  out = jnp.zeros((B, H, W), jnp.uint8)

  def paint(canvas, mask, cls):
    return jnp.where(mask, jnp.uint8(cls), canvas)

  # static layers, lowest priority first (chauffeurnet composite :252-261).
  # Windowed lookups (one contiguous DMA per episode + a small-operand
  # gather): per-pixel random gathers over a big town raster made the
  # train step ~30x slower at a 3072^2 corridor crop — same recipe as the
  # camera's ground pass. The BEV spans ±32 m; a 512 px window covers
  # ±64 m around the ego.
  pix = maps.world_to_pixel(scene.town_id[:, None],
                            grid.reshape(B, -1, 2))

  def sample_layer(ch):
    win, orig = maps.window(scene.town_id, ch, state.ego.pos, 512)
    return MapStack.sample_window(win, orig, pix).reshape(B, H, W) > 0

  out = paint(out, sample_layer(Layer.ROAD), BevClass.ROAD)
  out = paint(out, sample_layer(Layer.SIDEWALK), BevClass.SIDEWALK)
  out = paint(out, sample_layer(Layer.LANE_MARKING_ALL),
              BevClass.LANE_MARKING)
  out = paint(out, sample_layer(Layer.LANE_MARKING_BROKEN),
              BevClass.LANE_MARKING_BROKEN)

  # box layers, concatenated in priority order (later slots win in-kernel):
  # stop signs < lights (colored by state) < vehicles < walkers
  stops, lights = scene.stops, scene.lights
  lstate = lights.state_at(state.time_s)                       # [B,L]
  light_cls = jnp.where(
      lstate == LightState.GREEN, BevClass.LIGHT_GREEN,
      jnp.where(lstate == LightState.YELLOW, BevClass.LIGHT_YELLOW,
                BevClass.LIGHT_RED))
  veh, wlk = state.vehicles, state.walkers

  def const_cls(v, like):
    return jnp.full(like.shape[:2], v, jnp.int32)

  groups = [
      _boxes_to_grid(cfg, state, stops.pos, stops.yaw, stops.extent,
                     stops.valid, const_cls(BevClass.STOP_SIGN, stops.pos)),
      _boxes_to_grid(cfg, state, lights.pos, lights.yaw, lights.extent,
                     lights.valid, light_cls.astype(jnp.int32)),
      _boxes_to_grid(cfg, state, veh.pos, veh.yaw, veh.extent, veh.valid,
                     const_cls(BevClass.VEHICLE, veh.pos)),
      _boxes_to_grid(cfg, state, wlk.pos, wlk.yaw, wlk.extent, wlk.valid,
                     const_cls(BevClass.WALKER, wlk.pos)),
  ]
  args = [jnp.concatenate([g[i] for g in groups], axis=1) for i in range(7)]
  boxes = fill_boxes_bev(*args, h=H, w=W)
  return jnp.where(boxes > 0, boxes, out)
