"""Unscented Kalman filter over (x, y, yaw, v) — batched, jittable.

Re-design of the filterpy UKF used by the sensor agent
(sensor_agent.py:143-164, :750-841): Merwe scaled sigma points
(n=4, alpha=1e-5, beta=2, kappa=0), bicycle-model process function (WoR
constants), identity measurement, angle-aware means/residuals
(sin/cos averaging for yaw), and the reference's noise matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from carla_garage_tpu.config import SimConfig
from carla_garage_tpu.sim.dynamics import bicycle_step
from carla_garage_tpu.sim.geometry import normalize_angle

N = 4
# The reference uses alpha=1e-5 (sensor_agent.py:143) under float64; the
# resulting +-1e10 sigma weights cancel catastrophically in fp32, so we use
# alpha=1 (unit-spread sigma points, lambda=0) — same filter role, stable
# on TPU fp32.
ALPHA, BETA, KAPPA = 1.0, 2.0, 0.0
LAMBDA = ALPHA * ALPHA * (N + KAPPA) - N

P0 = jnp.diag(jnp.array([0.5, 0.5, 1e-6, 1e-6]))
# Reference R has 1e-15 for yaw/speed (trust them almost exactly,
# sensor_agent.py:159) — singular in fp32; 1e-6 keeps the same trust
# hierarchy with a workable condition number.
R = jnp.diag(jnp.array([0.5, 0.5, 1e-6, 1e-6]))
Q = jnp.diag(jnp.array([1e-4, 1e-4, 1e-3, 1e-3]))


@struct.dataclass
class UKFState:
  x: jnp.ndarray            # [B,4] (px, py, yaw, v)
  P: jnp.ndarray            # [B,4,4]
  initialized: jnp.ndarray  # [B] bool


def ukf_reset(B: int) -> UKFState:
  return UKFState(x=jnp.zeros((B, N)),
                  P=jnp.broadcast_to(P0, (B, N, N)),
                  initialized=jnp.zeros((B,), bool))


def _weights():
  wm = jnp.full((2 * N + 1,), 1.0 / (2 * (N + LAMBDA)))
  wc = wm
  wm = wm.at[0].set(LAMBDA / (N + LAMBDA))
  wc = wc.at[0].set(LAMBDA / (N + LAMBDA) + (1 - ALPHA ** 2 + BETA))
  return wm, wc


def _sigma_points(x, P):
  """x [B,4], P [B,4,4] -> [B,2N+1,4]."""
  # numerically robust Cholesky of (N+lambda) P
  A = jnp.linalg.cholesky((N + LAMBDA) * (P + 1e-6 * jnp.eye(N)))
  pts = jnp.concatenate([
      x[:, None],
      x[:, None] + jnp.swapaxes(A, -1, -2),
      x[:, None] - jnp.swapaxes(A, -1, -2)], axis=1)
  return pts


def _angle_mean(pts, wm):
  """Weighted mean with circular yaw (state_mean, sensor_agent.py:797-813)."""
  m = jnp.einsum("s,bsd->bd", wm, pts,
                 precision=jax.lax.Precision.HIGHEST)
  sin_m = jnp.einsum("s,bs->b", wm, jnp.sin(pts[..., 2]),
                    precision=jax.lax.Precision.HIGHEST)
  cos_m = jnp.einsum("s,bs->b", wm, jnp.cos(pts[..., 2]),
                    precision=jax.lax.Precision.HIGHEST)
  return m.at[:, 2].set(jnp.arctan2(sin_m, cos_m))


def _residual(a, b):
  y = a - b
  return y.at[..., 2].set(normalize_angle(y[..., 2]))


def ukf_predict(state: UKFState, steer, throttle, brake, cfg: SimConfig,
                dt: float = 0.05) -> UKFState:
  """Process update with the applied control (sensor_agent.py:300-303)."""
  wm, wc = _weights()
  pts = _sigma_points(state.x, state.P)                       # [B,S,4]
  pos, yaw, spd = bicycle_step(
      pts[..., :2], pts[..., 2], pts[..., 3],
      steer[:, None], throttle[:, None], brake[:, None], cfg, dt=dt)
  fpts = jnp.concatenate([pos, yaw[..., None], spd[..., None]], -1)
  xm = _angle_mean(fpts, wm)
  d = _residual(fpts, xm[:, None])
  P = jnp.einsum("s,bsi,bsj->bij", wc, d, d,
                precision=jax.lax.Precision.HIGHEST) + Q
  return state.replace(x=xm, P=P)


def ukf_update(state: UKFState, z: jnp.ndarray) -> UKFState:
  """Measurement update; identity measurement fn. z [B,4]."""
  wm, wc = _weights()
  pts = _sigma_points(state.x, state.P)
  zm = _angle_mean(pts, wm)
  dz = _residual(pts, zm[:, None])
  S = jnp.einsum("s,bsi,bsj->bij", wc, dz, dz,
               precision=jax.lax.Precision.HIGHEST) + R
  dx = _residual(pts, state.x[:, None])
  C = jnp.einsum("s,bsi,bsj->bij", wc, dx, dz,
               precision=jax.lax.Precision.HIGHEST)
  K = jnp.linalg.solve(jnp.swapaxes(S, -1, -2),
                       jnp.swapaxes(C, -1, -2))
  K = jnp.swapaxes(K, -1, -2)
  innov = _residual(z, zm)
  x = state.x + jnp.einsum("bij,bj->bi", K, innov,
                             precision=jax.lax.Precision.HIGHEST)
  x = x.at[:, 2].set(normalize_angle(x[:, 2]))
  P = state.P - jnp.einsum("bij,bjk,blk->bil", K, S, K,
                          precision=jax.lax.Precision.HIGHEST)
  P = 0.5 * (P + jnp.swapaxes(P, -1, -2)) + 1e-6 * jnp.eye(N)  # keep PSD
  # first measurement initializes the state directly (sensor_agent.py:161)
  init = state.initialized
  x = jnp.where(init[:, None], x, z)
  P = jnp.where(init[:, None, None], P, jnp.broadcast_to(P0, P.shape))
  return UKFState(x=x, P=P, initialized=jnp.ones_like(init))
