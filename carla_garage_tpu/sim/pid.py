"""PID controllers as pure functions over explicit window state.

Matches nav_planner.PIDController:15-45 exactly: a length-n error window
pre-filled with zeros (deque maxlen=n), integral = mean(window),
derivative = window[-1] - window[-2]. Stateless-function form so the same
controller runs for the live ego [B], and inside forecast rollouts [B,T].
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from carla_garage_tpu.structs import PIDState


@dataclasses.dataclass(frozen=True)
class PIDParams:
  k_p: float
  k_i: float
  k_d: float
  n: int = 20


def pid_step(state: PIDState, error: jnp.ndarray, p: PIDParams):
  """Append error, return (new_state, output). error [...] matches window[...,n]."""
  window = jnp.concatenate(
      [state.window[..., 1:], error[..., None]], axis=-1)
  integral = jnp.mean(window, axis=-1)
  derivative = window[..., -1] - window[..., -2]
  out = p.k_p * error + p.k_i * integral + p.k_d * derivative
  return PIDState(window=window), out
