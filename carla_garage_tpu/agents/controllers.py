"""Inference-time controllers — model outputs -> VehicleControl.

Batched pure-function re-designs of LidarCenterNet.control_pid
(model.py:503-554, waypoint representation) and control_pid_direct
(model.py:461-501, classified target speed + predicted route angle).
"""

from __future__ import annotations

import jax.numpy as jnp

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.sim.pid import PIDParams, pid_step
from carla_garage_tpu.structs import PIDState


def control_pid(pid_turn: PIDState, pid_speed: PIDState,
                waypoints: jnp.ndarray, speed: jnp.ndarray,
                cfg: GlobalConfig):
  """Waypoint-output controller (model.py:503-554).

  waypoints [B,P,2] ego-frame future positions at 4 Hz (data_save_freq 5 of
  20 fps); speed [B]. Returns (steer, throttle, brake, states...).
  """
  e = cfg.expert
  one_second = 4                      # carla_fps // (wp_dilation * save_freq)
  half_second = 2
  desired_speed = jnp.linalg.norm(
      waypoints[:, half_second - 1] - waypoints[:, one_second - 1],
      axis=-1) * 2.0

  brake = (desired_speed < 0.4) | \
          ((speed / jnp.maximum(desired_speed, 1e-6)) > e.brake_ratio)

  delta = jnp.clip(desired_speed - speed, 0.0, e.clip_delta)
  pid_speed2, thr = pid_step(pid_speed, delta,
                             PIDParams(e.speed_kp, e.speed_ki, e.speed_kd,
                                       e.speed_n))
  throttle = jnp.clip(thr, 0.0, e.clip_throttle)
  throttle = jnp.where(brake, 0.0, throttle)

  # aim point: first waypoint at least aim_distance away (slow/fast variant)
  aim_distance = jnp.where(desired_speed < 5.5, 2.25, 3.0)
  dist = jnp.linalg.norm(waypoints, axis=-1)              # [B,P]
  far_enough = dist >= aim_distance[:, None]
  first = jnp.argmax(far_enough, axis=-1)
  none_far = ~jnp.any(far_enough, axis=-1)
  aim_idx = jnp.where(none_far, waypoints.shape[1] - 1, first)
  aim = jnp.take_along_axis(waypoints, aim_idx[:, None, None], 1)[:, 0]
  angle = jnp.degrees(jnp.arctan2(aim[:, 1], aim[:, 0])) / 90.0
  angle = jnp.where((speed < 0.01) | brake, 0.0, angle)
  pid_turn2, st = pid_step(pid_turn, angle,
                           PIDParams(e.turn_kp, e.turn_ki, e.turn_kd,
                                     e.turn_n))
  steer = jnp.clip(st, -1.0, 1.0)
  return steer, throttle, brake.astype(jnp.float32), pid_turn2, pid_speed2


def control_pid_direct(pid_turn: PIDState, pid_speed: PIDState,
                       target_speed: jnp.ndarray, angle: jnp.ndarray,
                       speed: jnp.ndarray, cfg: GlobalConfig):
  """Direct-output controller (model.py:461-501): classified target speed
  (m/s, 0 = brake) + predicted route angle (normalized [-1,1])."""
  e = cfg.expert
  brake = target_speed < 0.01
  angle = jnp.where(speed < 0.01, 0.0, angle)
  pid_turn2, st = pid_step(pid_turn, angle,
                           PIDParams(e.turn_kp, e.turn_ki, e.turn_kd,
                                     e.turn_n))
  steer = jnp.clip(st, -1.0, 1.0)
  brake = brake | ((speed / jnp.maximum(target_speed, 1e-6)) > e.brake_ratio)
  ts = jnp.where(brake, 0.0, target_speed)
  delta = jnp.clip(ts - speed, 0.0, e.clip_delta)
  pid_speed2, thr = pid_step(pid_speed, delta,
                             PIDParams(e.speed_kp, e.speed_ki, e.speed_kd,
                                       e.speed_n))
  throttle = jnp.clip(thr, 0.0, e.clip_throttle)
  throttle = jnp.where(brake, 0.0, throttle)
  return steer, throttle, brake.astype(jnp.float32), pid_turn2, pid_speed2
