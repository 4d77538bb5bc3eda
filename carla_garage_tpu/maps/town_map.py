"""Tensorized town maps.

The reference ships pre-rasterized town layers as per-town ``.h5`` files
(birdview_map.py:22-344; loaded in chauffeurnet.py:87-100) and queries road
topology through the CARLA C++ OpenDRIVE map. Here the raster IS the map: a
stacked uint8 layer tensor per town plus lane-graph polylines for NPC routing,
queried on-device with pure gathers.

Pixel convention (matches the reference h5 attrs): px = (world_xy -
world_offset) * pixels_per_meter, row = py, col = px.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


class Layer:
  """Raster channel indices."""
  ROAD = 0
  SIDEWALK = 1
  LANE_MARKING_ALL = 2
  LANE_MARKING_BROKEN = 3
  STOPLINE = 4
  JUNCTION = 5
  OBSTACLE = 6     # solid static geometry (buildings): off-map eroded ~2.5 m
  GROUND_SEM = 7   # precomputed camera semantic class per ground pixel
  LANE_DIR = 8     # lane travel direction: 0 = none, 1..16 = yaw bin
  NUM = 9


@struct.dataclass
class MapStack:
  """A stack of town rasters padded to a common size.

  layers [T,C,H,W] uint8 (0/255 occupancy), ppm [] float,
  world_offset [T,2] float (meters of pixel (0,0)).
  """
  layers: jnp.ndarray
  ppm: jnp.ndarray
  world_offset: jnp.ndarray

  def world_to_pixel(self, town_id: jnp.ndarray, xy: jnp.ndarray):
    """xy [..,2] world meters -> float pixel coords [..,2] (px, py)."""
    off = self.world_offset[town_id]          # [..,2] via broadcasting
    return (xy - off) * self.ppm

  def sample(self, town_id: jnp.ndarray, channel: int,
             xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor occupancy sample. xy [..,2] -> bool [..].

    Out-of-bounds samples return False. town_id broadcastable against xy[..,0].
    """
    p = self.world_to_pixel(town_id[..., None] if jnp.ndim(town_id) and
                            jnp.ndim(town_id) < jnp.ndim(xy) - 1 else town_id,
                            xy)
    px = jnp.round(p[..., 0]).astype(jnp.int32)
    py = jnp.round(p[..., 1]).astype(jnp.int32)
    h, w = self.layers.shape[-2], self.layers.shape[-1]
    inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    val = self.layers[town_id, channel, pyc, pxc]
    return jnp.where(inb, val > 0, False)

  def window(self, town_id: jnp.ndarray, channel: int,
             center_xy: jnp.ndarray, size_px: int):
    """Contiguous [B,S,S] window of one channel around per-episode centers.

    One dynamic_slice DMA per episode instead of per-point HBM gathers —
    the fast path for dense LOCAL sampling (camera/LiDAR ground lookups):
    random 1-byte gathers from the full [T,C,H,W] stack cost a ~512-byte
    HBM transaction each, while the window is a linear copy and follow-up
    gathers hit a small operand. Returns (window [B,S,S], origin_px [B,2])."""
    import jax
    p = self.world_to_pixel(town_id, center_xy)        # [B,2] float
    h, w = self.layers.shape[-2], self.layers.shape[-1]
    ox = jnp.clip(jnp.round(p[..., 0]).astype(jnp.int32) - size_px // 2,
                  0, max(w - size_px, 0))
    oy = jnp.clip(jnp.round(p[..., 1]).astype(jnp.int32) - size_px // 2,
                  0, max(h - size_px, 0))

    def slice_one(t, y, x):
      return jax.lax.dynamic_slice(
          self.layers, (t, channel, y, x),
          (1, 1, min(size_px, h), min(size_px, w)))[0, 0]

    win = jax.vmap(slice_one)(town_id, oy, ox)
    return win, jnp.stack([ox, oy], -1)

  @staticmethod
  def sample_window(win: jnp.ndarray, origin_px: jnp.ndarray,
                    pix: jnp.ndarray) -> jnp.ndarray:
    """Sample [B,S,S] windows at float pixel coords pix [B,N,2]
    (edge-clamped). Returns [B,N] int32 values."""
    S = win.shape[-1]
    px = jnp.clip(jnp.round(pix[..., 0]).astype(jnp.int32) -
                  origin_px[:, None, 0], 0, S - 1)
    py = jnp.clip(jnp.round(pix[..., 1]).astype(jnp.int32) -
                  origin_px[:, None, 1], 0, S - 1)
    return jnp.take_along_axis(
        win.reshape(win.shape[0], -1), py * S + px, axis=1).astype(jnp.int32)

  def sample_value(self, town_id: jnp.ndarray, channel: int,
                   xy: jnp.ndarray) -> jnp.ndarray:
    """Raw uint8 raster value (0 out of bounds). xy [..,2] -> [..]."""
    p = self.world_to_pixel(town_id[..., None] if jnp.ndim(town_id) and
                            jnp.ndim(town_id) < jnp.ndim(xy) - 1 else town_id,
                            xy)
    px = jnp.round(p[..., 0]).astype(jnp.int32)
    py = jnp.round(p[..., 1]).astype(jnp.int32)
    h, w = self.layers.shape[-2], self.layers.shape[-1]
    inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    val = self.layers[town_id, channel, pyc, pxc]
    return jnp.where(inb, val, 0).astype(jnp.int32)


def stack_towns(rasters: list[np.ndarray], offsets: list[np.ndarray],
                ppm: float) -> MapStack:
  """Pad per-town [C,H,W] rasters to a common size and stack to [T,C,H,W]."""
  max_h = max(r.shape[1] for r in rasters)
  max_w = max(r.shape[2] for r in rasters)
  padded = np.zeros((len(rasters), rasters[0].shape[0], max_h, max_w),
                    np.uint8)
  for i, r in enumerate(rasters):
    padded[i, :, :r.shape[1], :r.shape[2]] = r
  return MapStack(layers=jnp.asarray(padded),
                  ppm=jnp.float32(ppm),
                  world_offset=jnp.asarray(np.stack(offsets), jnp.float32))


@struct.dataclass
class LaneGraph:
  """NPC routing lanes as fixed-shape polylines.

  points [N,P,2] padded polylines, num_valid [N], successor [N, MAX_SUCC]
  int32 lane indices (-1 = none). The behavioral stand-in for the CARLA
  TrafficManager's lane topology (route_scenario_local.py:445-494)."""
  points: jnp.ndarray
  num_valid: jnp.ndarray
  successor: jnp.ndarray
  seg_len: jnp.ndarray      # [N,P] distance between consecutive points
  total_len: jnp.ndarray    # [N]

  @staticmethod
  def from_polylines(polys: list[np.ndarray],
                     successors: list[list[int]],
                     max_points: int | None = None,
                     max_succ: int = 4) -> "LaneGraph":
    n = len(polys)
    if max_points is None:   # fit the longest polyline (rounded up)
      longest = max(len(p) for p in polys) if polys else 2
      max_points = max(-(-longest // 64) * 64, 64)
    pts = np.zeros((n, max_points, 2), np.float32)
    nv = np.zeros((n,), np.int32)
    suc = -np.ones((n, max_succ), np.int32)
    seg = np.zeros((n, max_points), np.float32)
    tot = np.zeros((n,), np.float32)
    for i, poly in enumerate(polys):
      poly = np.asarray(poly, np.float32)[:max_points]
      pts[i, :len(poly)] = poly
      pts[i, len(poly):] = poly[-1]          # pad with the endpoint
      nv[i] = len(poly)
      seg[i, 1:len(poly)] = np.linalg.norm(np.diff(poly, axis=0), axis=-1)
      tot[i] = seg[i].sum()
      for j, s in enumerate(successors[i][:max_succ]):
        suc[i, j] = s
    return LaneGraph(points=jnp.asarray(pts), num_valid=jnp.asarray(nv),
                     successor=jnp.asarray(suc), seg_len=jnp.asarray(seg),
                     total_len=jnp.asarray(tot))

  def position_at(self, lane_id: jnp.ndarray, t: jnp.ndarray):
    """Interpolated (pos [..,2], yaw [..]) at arc-length t on lane lane_id."""
    seg = self.seg_len[lane_id]                     # [..,P]
    cum = jnp.cumsum(seg, -1)                       # arc length at each point
    idx = jnp.sum((cum <= t[..., None]).astype(jnp.int32), -1)
    idx = jnp.clip(idx, 1, self.points.shape[1] - 1)
    p0 = jnp.take_along_axis(self.points[lane_id], (idx - 1)[..., None, None],
                             -2)[..., 0, :]
    p1 = jnp.take_along_axis(self.points[lane_id], idx[..., None, None],
                             -2)[..., 0, :]
    c0 = jnp.take_along_axis(cum, (idx - 1)[..., None], -1)[..., 0]
    s = jnp.take_along_axis(seg, idx[..., None], -1)[..., 0]
    frac = jnp.clip((t - c0) / jnp.maximum(s, 1e-6), 0.0, 1.0)
    pos = p0 + (p1 - p0) * frac[..., None]
    d = p1 - p0
    yaw = jnp.arctan2(d[..., 1], d[..., 0])
    return pos, yaw
