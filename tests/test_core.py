"""Unit tests: dynamics, PID, route planner, geometry — against golden numpy
references implementing the reference semantics directly (SURVEY.md §4:
'pure-function unit tests against golden numpy references')."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_garage_tpu.config import DEFAULT_CONFIG
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.sim.dynamics import bicycle_step
from carla_garage_tpu.sim.pid import PIDParams, pid_step
from carla_garage_tpu.sim.route_planner import (PlannerParams, planner_reset,
                                                planner_step)
from carla_garage_tpu.structs import PIDState

CFG = DEFAULT_CONFIG


def golden_bicycle(loc, yaw, spd, steer, throt, brake, dt=0.05):
  """Direct transcription of the EgoModel.forward math (autopilot.py:1180-1207)."""
  front_wb, rear_wb = -0.090769015, 1.4178275
  steer_gain, brake_accel, throt_accel = 0.36848336, -4.952399, 0.5633837
  accel = brake_accel if brake else throt_accel * throt
  wheel = steer_gain * steer
  beta = math.atan(rear_wb / (front_wb + rear_wb) * math.tan(wheel))
  x = loc[0] + spd * math.cos(yaw + beta) * dt
  y = loc[1] + spd * math.sin(yaw + beta) * dt
  nyaw = yaw + spd / rear_wb * math.sin(beta) * dt
  nspd = max(spd + accel * dt, 0.0)
  return (x, y), nyaw, nspd


def test_bicycle_matches_golden():
  rng = np.random.default_rng(0)
  for _ in range(50):
    loc = rng.uniform(-10, 10, 2)
    yaw = rng.uniform(-3, 3)
    spd = rng.uniform(0, 10)
    steer = rng.uniform(-1, 1)
    throt = rng.uniform(0, 1)
    brake = rng.integers(0, 2)
    g_loc, g_yaw, g_spd = golden_bicycle(loc, yaw, spd, steer, throt, brake)
    pos, nyaw, nspd = bicycle_step(
        jnp.asarray(loc), jnp.asarray(yaw), jnp.asarray(spd),
        jnp.asarray(steer), jnp.asarray(throt), jnp.asarray(float(brake)),
        CFG.sim)
    np.testing.assert_allclose(np.asarray(pos), g_loc, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(nyaw), g_yaw, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(nspd), g_spd, rtol=1e-5, atol=1e-5)


def test_bicycle_batched_shapes():
  pos = jnp.zeros((4, 7, 2))
  yaw = jnp.zeros((4, 7))
  spd = jnp.ones((4, 7))
  p, y, s = bicycle_step(pos, yaw, spd, yaw, spd * 0.5, yaw, CFG.sim)
  assert p.shape == (4, 7, 2) and y.shape == (4, 7) and s.shape == (4, 7)


class GoldenPID:
  """nav_planner.PIDController:15-45 transcription."""

  def __init__(self, kp, ki, kd, n=20):
    from collections import deque
    self.kp, self.ki, self.kd = kp, ki, kd
    self.win = deque([0] * n, maxlen=n)

  def step(self, err):
    self.win.append(err)
    integral = sum(self.win) / len(self.win)
    derivative = self.win[-1] - self.win[-2]
    return self.kp * err + self.ki * integral + self.kd * derivative


def test_pid_matches_golden():
  p = PIDParams(1.25, 0.75, 0.3, 20)
  golden = GoldenPID(1.25, 0.75, 0.3, 20)
  st = PIDState.create((), 20)
  rng = np.random.default_rng(1)
  for _ in range(60):
    err = float(rng.uniform(-1, 1))
    st, out = pid_step(st, jnp.float32(err), p)
    g = golden.step(err)
    np.testing.assert_allclose(float(out), g, rtol=1e-5, atol=1e-5)


class GoldenRoutePlanner:
  """nav_planner.RoutePlanner run_step transcription (deque-based)."""

  def __init__(self, min_d, max_d, points):
    from collections import deque
    self.min_d, self.max_d = min_d, max_d
    self.route = deque([np.asarray(p, np.float64) for p in points])
    self.dists = deque([0.0] + [
        float(np.linalg.norm(points[i] - points[i - 1]))
        for i in range(1, len(points))])
    self.is_last = False

  def run_step(self, gps):
    if len(self.route) <= 2:
      self.is_last = True
      return self.route
    to_pop = 0
    farthest = -np.inf
    cum = 0.0
    for i in range(1, len(self.route)):
      if cum > self.max_d:
        break
      cum += self.dists[i]
      d = float(np.linalg.norm(self.route[i] - gps))
      if farthest < d <= self.min_d:
        farthest = d
        to_pop = i
    for _ in range(to_pop):
      if len(self.route) > 2:
        self.route.popleft()
        self.dists.popleft()
    return self.route


@pytest.mark.parametrize("min_d,max_d", [(3.5, 50.0), (7.5, 50.0)])
def test_route_planner_matches_golden(min_d, max_d):
  rng = np.random.default_rng(2)
  # a wiggly 1 m-spaced route
  n = 200
  heading = np.cumsum(rng.uniform(-0.1, 0.1, n))
  pts = np.cumsum(np.stack([np.cos(heading), np.sin(heading)], -1), 0)
  pts = pts.astype(np.float32)
  seg = np.concatenate([[0.0],
                        np.linalg.norm(np.diff(pts, axis=0), axis=-1)])
  golden = GoldenRoutePlanner(min_d, max_d, pts)
  params = PlannerParams(min_d, max_d, window=64)
  st = planner_reset(())
  pos = pts[0].copy()
  for step in range(150):
    # drive along the route with noise
    pos = pts[min(step, n - 1)] + rng.uniform(-0.5, 0.5, 2).astype(np.float32)
    golden.run_step(pos)
    st = planner_step(st, jnp.asarray(pts), jnp.asarray(seg),
                      jnp.int32(n), jnp.asarray(pos), params)
    remaining_golden = len(golden.route)
    remaining_ours = n - int(st.idx)
    assert remaining_golden == remaining_ours, f"step {step}"
    assert bool(st.is_last) == golden.is_last


def golden_obb_intersect(c1, y1, e1, c2, y2, e2):
  """3D SAT specialized to z=0 plane boxes, as in autopilot.py:1094-1136."""
  def axes(y):
    return (np.array([np.cos(y), np.sin(y)]),
            np.array([-np.sin(y), np.cos(y)]))
  f1, r1 = axes(y1)
  f2, r2 = axes(y2)
  d = np.asarray(c2) - np.asarray(c1)
  for ax in (f1, r1, f2, r2):
    if abs(d @ ax) > (abs(f1 @ ax) * e1[0] + abs(r1 @ ax) * e1[1] +
                      abs(f2 @ ax) * e2[0] + abs(r2 @ ax) * e2[1]):
      return False
  return True


def test_obb_matches_golden():
  rng = np.random.default_rng(3)
  c1 = rng.uniform(-5, 5, (200, 2))
  c2 = rng.uniform(-5, 5, (200, 2))
  y1 = rng.uniform(-3, 3, 200)
  y2 = rng.uniform(-3, 3, 200)
  e1 = rng.uniform(0.5, 3, (200, 2))
  e2 = rng.uniform(0.5, 3, (200, 2))
  ours = geo.obb_intersect(jnp.asarray(c1), jnp.asarray(y1), jnp.asarray(e1),
                           jnp.asarray(c2), jnp.asarray(y2), jnp.asarray(e2))
  golden = [golden_obb_intersect(c1[i], y1[i], e1[i], c2[i], y2[i], e2[i])
            for i in range(200)]
  np.testing.assert_array_equal(np.asarray(ours), golden)


def test_angle_to_target():
  # target straight ahead -> 0; to the left (+y at yaw 0 is "right" in
  # CARLA-handed coords) -> sign convention of autopilot._get_angle_to
  a = geo.angle_to_target_deg(jnp.zeros(2), jnp.float32(0.0),
                              jnp.array([5.0, 0.0]))
  assert abs(float(a)) < 1e-5
  a = geo.angle_to_target_deg(jnp.zeros(2), jnp.float32(0.0),
                              jnp.array([5.0, 5.0]))
  np.testing.assert_allclose(float(a), 45.0, atol=1e-4)


def test_devices_virtual_mesh():
  assert len(jax.devices()) == 8
