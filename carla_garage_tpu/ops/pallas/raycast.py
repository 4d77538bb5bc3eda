"""Pallas TPU kernel: ray vs box-set intersection for sensor rendering.

The dense XLA path of sensors/raycast.py materializes [B, N_rays, K_boxes]
intermediates in HBM (~GBs per frame batch) — camera rendering is
HBM-bound. This kernel tiles rays into VMEM blocks (8x128 per step), keeps
the box set in SMEM, and loops boxes per tile with running min-depth /
class registers — the classic speed-of-light structure for raycasting on
the VPU.

Box model matches sensors.raycast.ray_box: upright oriented boxes standing
on the ground plane (z in [0, 2*ez]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 64          # ray-tile rows: big tiles amortize the per-box scalar
                   # loads + loop overhead over 8x more vector work
LANES = 128        # ray-tile columns (lane)
NFIELDS = 9        # cx, cy, cos, sin, ex, ey, ez, cls, valid


def _ray_box_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    boxes_ref, t_ref, cls_ref, *, n_boxes):
  dx = dx_ref[...]
  dy = dy_ref[...]
  dz = dz_ref[...]
  ox = ox_ref[0, 0]
  oy = oy_ref[0, 0]
  oz = oz_ref[0, 0]

  big = jnp.float32(1e9)
  t0 = jnp.full((ROWS, LANES), big, jnp.float32)
  c0 = jnp.zeros((ROWS, LANES), jnp.int32)

  def body(v, carry):
    t_best, c_best = carry
    cx = boxes_ref[0, v]
    cy = boxes_ref[1, v]
    cs = boxes_ref[2, v]
    sn = boxes_ref[3, v]
    ex = boxes_ref[4, v]
    ey = boxes_ref[5, v]
    ez = boxes_ref[6, v]
    cls_v = boxes_ref[7, v].astype(jnp.int32)
    valid = boxes_ref[8, v] > 0

    px = ox - cx
    py = oy - cy
    lx = cs * px + sn * py
    ly = -sn * px + cs * py
    lz = oz - ez
    rdx = cs * dx + sn * dy
    rdy = -sn * dx + cs * dy

    def slab(p, r, e):
      r_safe = jnp.where(jnp.abs(r) < 1e-9, 1e-9, r)
      ta = (-e - p) / r_safe
      tb = (e - p) / r_safe
      return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

    tx0, tx1 = slab(lx, rdx, ex)
    ty0, ty1 = slab(ly, rdy, ey)
    tz0, tz1 = slab(lz, dz, ez)
    tmin = jnp.maximum(jnp.maximum(tx0, ty0), tz0)
    tmax = jnp.minimum(jnp.minimum(tx1, ty1), tz1)
    hit = (tmax >= tmin) & (tmax > 0) & valid
    t_hit = jnp.where(tmin > 0, tmin, tmax)
    closer = hit & (t_hit < t_best)
    return (jnp.where(closer, t_hit, t_best),
            jnp.where(closer, cls_v, c_best))

  t_best, c_best = jax.lax.fori_loop(0, n_boxes, body, (t0, c0))
  t_ref[...] = t_best
  cls_ref[...] = c_best


@functools.partial(jax.jit, static_argnames=())
def raycast_boxes(origins, dirs, boxes):
  """origins [B,3]; dirs [B,N,3] (N multiple of ROWS*LANES);
  boxes [B,K,NFIELDS] (cx, cy, cos, sin, ex, ey, ez, cls, valid).
  Returns (t [B,N] f32 with 1e9 = miss, cls [B,N] i32)."""
  B, N, _ = dirs.shape
  K = boxes.shape[1]
  Kp = max(-(-K // 128) * 128, 128)
  boxes_p = jnp.zeros((B, NFIELDS, Kp), jnp.float32)
  boxes_p = boxes_p.at[:, :, :K].set(
      jnp.swapaxes(boxes.astype(jnp.float32), 1, 2))
  rows = N // LANES
  assert rows % ROWS == 0, f"N={N} must tile into {ROWS}x{LANES}"
  grid = (B, rows // ROWS)
  d = dirs.reshape(B, rows, LANES, 3)
  dx = d[..., 0]
  dy = d[..., 1]
  dz = d[..., 2]
  o = origins.astype(jnp.float32)

  spec_dir = pl.BlockSpec((None, ROWS, LANES), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
  spec_scalar = pl.BlockSpec((None, 1, 1), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.SMEM)
  spec_boxes = pl.BlockSpec((None, NFIELDS, Kp), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.SMEM)
  interpret = jax.devices()[0].platform == "cpu"
  t, cls = pl.pallas_call(
      functools.partial(_ray_box_kernel, n_boxes=K),
      grid=grid,
      in_specs=[spec_scalar] * 3 + [spec_dir] * 3 + [spec_boxes],
      out_specs=(pl.BlockSpec((None, ROWS, LANES), lambda b, i: (b, i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((None, ROWS, LANES), lambda b, i: (b, i, 0),
                              memory_space=pltpu.VMEM)),
      out_shape=(jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((B, rows, LANES), jnp.int32)),
      interpret=interpret,
  )(o[:, 0:1, None], o[:, 1:2, None], o[:, 2:3, None], dx, dy, dz, boxes_p)
  return t.reshape(B, N), cls.reshape(B, N)
