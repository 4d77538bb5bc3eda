"""Vectorized 2D geometry: transforms, angles, OBB intersection.

The reference tests 3D oriented-bounding-box intersection with 15 separating
axes per pair, one pair at a time in Python (autopilot.py:1094-1136). Ground
traffic lives on the z=0 plane, so we use the exact 2D specialization: 4
candidate separating axes (each box's two face normals), fully batched. This
is the hot primitive of hazard forecasting (B×T×V pairs per tick).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_angle(a: jnp.ndarray) -> jnp.ndarray:
  """Wrap angle(s) to (-pi, pi]. (transfuser_utils.py angle normalization.)"""
  return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def rot2d(yaw: jnp.ndarray) -> jnp.ndarray:
  """Rotation matrices [..,2,2] for yaw [..]."""
  c, s = jnp.cos(yaw), jnp.sin(yaw)
  return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def world_to_ego(points: jnp.ndarray, ego_pos: jnp.ndarray,
                 ego_yaw: jnp.ndarray) -> jnp.ndarray:
  """World xy -> ego frame. points [..,2]; broadcasts over leading dims.

  Matches transfuser_utils.inverse_conversion_2d / autopilot._get_angle_to
  frame convention: x forward, y left(+CARLA handedness preserved)."""
  d = points - ego_pos
  c, s = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
  x = c * d[..., 0] + s * d[..., 1]
  y = -s * d[..., 0] + c * d[..., 1]
  return jnp.stack([x, y], -1)


def ego_to_world(points: jnp.ndarray, ego_pos: jnp.ndarray,
                 ego_yaw: jnp.ndarray) -> jnp.ndarray:
  c, s = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
  x = c * points[..., 0] - s * points[..., 1]
  y = s * points[..., 0] + c * points[..., 1]
  return jnp.stack([x, y], -1) + ego_pos


def angle_to_target_deg(pos: jnp.ndarray, yaw: jnp.ndarray,
                        target: jnp.ndarray) -> jnp.ndarray:
  """Signed angle (degrees) from heading to target point.

  Matches autopilot._get_angle_to:1138-1148: angle = -deg(atan2(-y_ego, x_ego))."""
  local = world_to_ego(target, pos, yaw)
  return -jnp.degrees(jnp.arctan2(-local[..., 1], local[..., 0]))


def obb_intersect(c1: jnp.ndarray, y1: jnp.ndarray, e1: jnp.ndarray,
                  c2: jnp.ndarray, y2: jnp.ndarray, e2: jnp.ndarray
                  ) -> jnp.ndarray:
  """Batched 2D OBB overlap via the separating-axis theorem.

  c* [..,2] centers, y* [..] yaws, e* [..,2] half-extents. Broadcasts over
  leading dims; returns bool [..]. Exact 2D analog of
  autopilot.check_obb_intersection:1109-1136.
  """
  d = c2 - c1
  cs1, sn1 = jnp.cos(y1), jnp.sin(y1)
  cs2, sn2 = jnp.cos(y2), jnp.sin(y2)
  # Box axes (unit): f = forward, r = right
  f1 = jnp.stack([cs1, sn1], -1)
  r1 = jnp.stack([-sn1, cs1], -1)
  f2 = jnp.stack([cs2, sn2], -1)
  r2 = jnp.stack([-sn2, cs2], -1)

  def separated(axis):
    proj_d = jnp.abs(jnp.sum(d * axis, -1))
    rad1 = (jnp.abs(jnp.sum(f1 * axis, -1)) * e1[..., 0] +
            jnp.abs(jnp.sum(r1 * axis, -1)) * e1[..., 1])
    rad2 = (jnp.abs(jnp.sum(f2 * axis, -1)) * e2[..., 0] +
            jnp.abs(jnp.sum(r2 * axis, -1)) * e2[..., 1])
    return proj_d > rad1 + rad2

  sep = separated(f1) | separated(r1) | separated(f2) | separated(r2)
  return ~sep


def point_in_obb(p: jnp.ndarray, c: jnp.ndarray, yaw: jnp.ndarray,
                 e: jnp.ndarray) -> jnp.ndarray:
  """Point-in-oriented-box test. p [..,2], box (c,yaw,e) broadcastable."""
  local = world_to_ego(p, c, yaw)
  return (jnp.abs(local[..., 0]) <= e[..., 0]) & (
      jnp.abs(local[..., 1]) <= e[..., 1])


def box_corners(c: jnp.ndarray, yaw: jnp.ndarray, e: jnp.ndarray
                ) -> jnp.ndarray:
  """Corner points [..,4,2] of OBBs."""
  signs = jnp.array([[1., 1.], [1., -1.], [-1., -1.], [-1., 1.]])
  local = signs * e[..., None, :]
  return ego_to_world(local, c[..., None, :], yaw[..., None])
