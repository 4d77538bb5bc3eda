"""Host-side route compiler: sparse keypoints -> dense 1 m centerline arrays.

The reference densifies route XML keypoints through CARLA's C++
GlobalRoutePlanner over the OpenDRIVE lane graph
(route_manipulation.interpolate_trajectory:132-158, hop resolution 1 m).
Without a C++ map server we compile routes offline on the host: keypoints
carry headings (the route XMLs store yaw), so a C1 cubic-Hermite spline
through (position, heading) pairs reproduces lane-following paths including
smooth junction turns. Runs once per route; the device only ever sees the
padded arrays (structs.Route).
"""

from __future__ import annotations

import numpy as np

from carla_garage_tpu.structs import Cmd


def hermite_segment(p0, t0, p1, t1, n):
  """Cubic Hermite curve samples (excluding endpoint). p,t [2]; n samples."""
  s = np.linspace(0.0, 1.0, n, endpoint=False)[:, None]
  h00 = 2 * s**3 - 3 * s**2 + 1
  h10 = s**3 - 2 * s**2 + s
  h01 = -2 * s**3 + 3 * s**2
  h11 = s**3 - s**2
  return h00 * p0 + h10 * t0 + h01 * p1 + h11 * t1


def interpolate_keypoints(xy: np.ndarray, yaw: np.ndarray,
                          hop: float = 1.0) -> np.ndarray:
  """Dense points [R,2] at ~hop spacing through keypoints with headings.

  xy [K,2], yaw [K] radians. Analog of interpolate_trajectory
  (nav_planner.py:139-172) with Hermite arcs replacing lane-graph tracing.
  """
  pieces = []
  for i in range(len(xy) - 1):
    p0, p1 = xy[i], xy[i + 1]
    d = np.linalg.norm(p1 - p0)
    if d < 1e-6:
      continue
    t0 = d * np.array([np.cos(yaw[i]), np.sin(yaw[i])])
    t1 = d * np.array([np.cos(yaw[i + 1]), np.sin(yaw[i + 1])])
    fine = hermite_segment(p0, t0, p1, t1, max(int(d / hop) * 8, 8))
    pieces.append(fine)
  pieces.append(xy[-1:])
  fine = np.concatenate(pieces, 0)
  # resample to uniform hop spacing by arc length
  seg = np.linalg.norm(np.diff(fine, axis=0), axis=-1)
  arc = np.concatenate([[0.0], np.cumsum(seg)])
  total = arc[-1]
  n_out = max(int(np.floor(total / hop)) + 1, 2)
  targets = np.arange(n_out) * hop
  out = np.stack([np.interp(targets, arc, fine[:, 0]),
                  np.interp(targets, arc, fine[:, 1])], -1)
  if total - targets[-1] > 0.25 * hop:
    out = np.concatenate([out, fine[-1:]], 0)
  return out.astype(np.float32)


def classify_commands(points: np.ndarray, junction_mask: np.ndarray,
                      turn_threshold_deg: float = 25.0) -> np.ndarray:
  """Per-point navigation command from geometry.

  Junction traversals get LEFT/RIGHT/STRAIGHT by total heading change across
  the junction; everything else LANE_FOLLOW. Behavioral analog of the road
  options produced by CARLA's GlobalRoutePlanner.
  """
  n = len(points)
  cmd = np.full((n,), Cmd.LANE_FOLLOW, np.int32)
  yaws = np.arctan2(*np.diff(points, axis=0).T[::-1])
  yaws = np.concatenate([yaws, yaws[-1:]])
  i = 0
  while i < n:
    if junction_mask[i]:
      j = i
      while j < n and junction_mask[j]:
        j += 1
      a0 = yaws[max(i - 2, 0)]
      a1 = yaws[min(j + 1, n - 1)]
      dyaw = np.degrees(np.arctan2(np.sin(a1 - a0), np.cos(a1 - a0)))
      if dyaw > turn_threshold_deg:
        c = Cmd.RIGHT if _is_right_handed(points, i, j) else Cmd.LEFT
      elif dyaw < -turn_threshold_deg:
        c = Cmd.LEFT if _is_right_handed(points, i, j) else Cmd.RIGHT
      else:
        c = Cmd.STRAIGHT
      cmd[i:j] = c
      i = j
    else:
      i += 1
  return cmd


def _is_right_handed(points, i, j):
  """CARLA yaw increases clockwise when viewed in image coords (y down in
  world): positive heading change = right turn."""
  return True


def downsample_route(points: np.ndarray, cmd: np.ndarray,
                     spacing_m: float = 50.0):
  """Sparse command route: keep command-change boundaries and every
  `spacing_m`. Analog of route_manipulation.downsample_route:86 as consumed
  by set_global_plan (autonomous_agent.py:120-126, ~1/50 downsample)."""
  keep = [0]
  dist = 0.0
  for i in range(1, len(points)):
    dist += float(np.linalg.norm(points[i] - points[i - 1]))
    cmd_change = cmd[i] != cmd[i - 1]
    if cmd_change or dist >= spacing_m or i == len(points) - 1:
      keep.append(i)
      dist = 0.0
  keep = np.asarray(sorted(set(keep)), np.int32)
  return points[keep], cmd[keep]
