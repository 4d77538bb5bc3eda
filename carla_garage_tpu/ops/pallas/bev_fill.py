"""Pallas TPU kernel: oriented-box rasterization into the BEV grid.

The polygon-fill half of the BEV semantic renderer (sensors/bev.py paints
actor boxes with a dense [H,W,V] point-in-OBB test; the reference uses
cv2.fillConvexPoly, chauffeurnet.py:301-319). This kernel tiles the grid
into VMEM blocks and evaluates all V boxes per tile on the VPU — the box
parameters live in SMEM-friendly small arrays and the output tile is
written once.

Grid: (B, H/TILE, W/TILE). Box coordinates arrive pre-transformed into
grid-pixel space (x = col, y = row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _fill_kernel(boxes_ref, out_ref, *, n_boxes):
  """boxes_ref [8, Vp]: rows = (cx, cy, cos, sin, ex, ey, cls, valid)."""
  i = pl.program_id(1)          # tile row
  j = pl.program_id(2)          # tile col
  rows = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) +
          i * TILE).astype(jnp.float32)
  cols = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1) +
          j * TILE).astype(jnp.float32)

  out = jnp.zeros((TILE, TILE), jnp.int32)

  def body(v, out):
    dx = cols - boxes_ref[0, v]
    dy = rows - boxes_ref[1, v]
    c = boxes_ref[2, v]
    s = boxes_ref[3, v]
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    inside = (jnp.abs(lx) <= boxes_ref[4, v]) & \
             (jnp.abs(ly) <= boxes_ref[5, v]) & (boxes_ref[7, v] > 0)
    return jnp.where(inside, boxes_ref[6, v].astype(jnp.int32), out)

  out = jax.lax.fori_loop(0, n_boxes, body, out)
  out_ref[:, :] = out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def fill_boxes_bev(cx, cy, yaw, ex, ey, cls, valid, h: int = 256,
                   w: int = 256):
  """Rasterize oriented boxes. All box args [B,V] in GRID-PIXEL units
  (centers as float pixels, extents as half-sizes in pixels); cls [B,V]
  int32 class painted inside (later boxes win overlaps). Returns [B,h,w]
  uint8 (0 where no box).
  """
  B, V = cx.shape
  boxes = jnp.stack([cx, cy, jnp.cos(yaw), jnp.sin(yaw), ex, ey,
                     cls.astype(jnp.float32),
                     valid.astype(jnp.float32)], axis=1)   # [B,8,V]
  # pad the box lane dimension to the fp32 tile width (8, 128)
  Vp = max(-(-V // 128) * 128, 128)
  boxes = jnp.pad(boxes, ((0, 0), (0, 0), (0, Vp - V)))
  grid = (B, h // TILE, w // TILE)
  interpret = jax.devices()[0].platform == "cpu"
  return pl.pallas_call(
      functools.partial(_fill_kernel, n_boxes=V),
      interpret=interpret,
      grid=grid,
      in_specs=[pl.BlockSpec((None, 8, Vp), lambda b, i, j: (b, 0, 0),
                             memory_space=pltpu.SMEM)],
      out_specs=pl.BlockSpec((None, TILE, TILE),
                             lambda b, i, j: (b, i, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.uint8),
  )(boxes)


def fill_boxes_bev_reference(cx, cy, yaw, ex, ey, cls, valid,
                             h: int = 256, w: int = 256):
  """Dense jnp reference (the original sensors/bev.py path) for testing."""
  B, V = cx.shape
  rows = jnp.arange(h, dtype=jnp.float32)[:, None]
  cols = jnp.arange(w, dtype=jnp.float32)[None, :]
  out = jnp.zeros((B, h, w), jnp.int32)
  for v in range(V):
    dx = cols[None] - cx[:, v, None, None]
    dy = rows[None] - cy[:, v, None, None]
    c = jnp.cos(yaw[:, v, None, None])
    s = jnp.sin(yaw[:, v, None, None])
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    inside = (jnp.abs(lx) <= ex[:, v, None, None]) & \
             (jnp.abs(ly) <= ey[:, v, None, None]) & \
             valid[:, v, None, None]
    out = jnp.where(inside, cls[:, v, None, None], out)
  return out.astype(jnp.uint8)
