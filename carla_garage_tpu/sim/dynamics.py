"""Kinematic bicycle dynamics — the core integrator of the simulator.

The reference outsources vehicle physics to the CARLA UE4 server and *models*
it with a tuned kinematic bicycle for forecasting (autopilot.py:1162-1207,
World-on-Rails constants). In the TPU rebuild the bicycle model IS the world
dynamics: one fused element-wise update over [B] egos, [B,V] traffic, and
[B,T,V] forecast rollouts alike — pure VPU work that XLA fuses freely.
"""

from __future__ import annotations

import jax.numpy as jnp

from carla_garage_tpu.config import SimConfig


def bicycle_step(pos: jnp.ndarray, yaw: jnp.ndarray, speed: jnp.ndarray,
                 steer: jnp.ndarray, throttle: jnp.ndarray,
                 brake: jnp.ndarray, cfg: SimConfig, dt: float | None = None):
  """One dt step of the WoR-tuned kinematic bicycle.

  All args broadcastable; pos [..,2], others [..]. Returns (pos, yaw, speed).
  Matches EgoModel.forward (autopilot.py:1180-1207):
    accel = brake ? brake_accel : throt_accel * throttle
    beta  = atan(rear/(front+rear) * tan(steer_gain * steer))
    x    += v cos(yaw+beta) dt ;  y += v sin(yaw+beta) dt
    yaw  += v / rear * sin(beta) dt ;  v = max(v + accel dt, 0)
  """
  dt = cfg.dt if dt is None else dt
  braking = brake > 0.5
  accel = jnp.where(braking, cfg.brake_accel, cfg.throt_accel * throttle)
  wheel = cfg.steer_gain * steer
  beta = jnp.arctan(cfg.rear_wb / (cfg.front_wb + cfg.rear_wb)
                    * jnp.tan(wheel))
  heading = yaw + beta
  dpos = speed[..., None] * jnp.stack(
      [jnp.cos(heading), jnp.sin(heading)], -1) * dt
  new_pos = pos + dpos
  new_yaw = yaw + speed / cfg.rear_wb * jnp.sin(beta) * dt
  new_speed = jnp.maximum(speed + accel * dt, 0.0)
  return new_pos, new_yaw, new_speed


def forward_speed(vel_xy: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
  """Project a velocity vector onto the heading (autopilot._get_forward_speed)."""
  return (vel_xy[..., 0] * jnp.cos(yaw) + vel_xy[..., 1] * jnp.sin(yaw))
