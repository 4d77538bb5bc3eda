"""Atomic trigger conditions — masked array predicates.

Re-design of srunner's py_trees conditions
(scenario_runner/srunner/scenariomanager/scenarioatomics/
atomic_trigger_conditions.py) as pure [B,K]-shaped predicates usable
inside the jitted scenario step:

  InTriggerDistanceToLocation (:642)  -> in_trigger_distance
  InTimeToArrivalToLocation   (:761)  -> in_time_to_arrival
  InTriggerRegion             (:516)  -> in_trigger_region
  TriggerVelocity             (:330)  -> trigger_velocity

The reference's crossing scenarios arm on time-to-arrival, not distance
(object_crash_vehicle.py:324-326: InTimeToArrivalToVehicle with
_time_to_reach=10 s), so trigger timing scales with ego speed; these
predicates let scenario specs choose either semantic per row.
"""

from __future__ import annotations

import jax.numpy as jnp


class TriggerKind:
  DISTANCE = 0          # d(actor, location) < dist
  TIME_TO_ARRIVAL = 1   # d / max(v, eps) < t
  REGION = 2            # |dx| < ex and |dy| < ey
  VELOCITY = 3          # v > v_min


def in_trigger_distance(pos, target, dist):
  """InTriggerDistanceToLocation (:642): Euclidean proximity."""
  return jnp.linalg.norm(target - pos, axis=-1) < dist


def in_time_to_arrival(pos, speed, target, t_max, eps: float = 0.001):
  """InTimeToArrivalToLocation (:789-806): distance / velocity < t_max;
  a (near-)stopped actor has infinite time-to-arrival (the reference
  guards v=0 the same way)."""
  d = jnp.linalg.norm(target - pos, axis=-1)
  return d / jnp.maximum(speed, eps) < t_max


def in_trigger_region(pos, center, half_extent):
  """InTriggerRegion (:542-556): axis-aligned x/y window membership."""
  rel = jnp.abs(pos - center)
  return jnp.all(rel < half_extent, axis=-1)


def trigger_velocity(speed, v_min):
  """TriggerVelocity (:354-365, operator.gt default)."""
  return speed > v_min


def evaluate(kind, pos, speed, target, dist, param, half_extent):
  """Dispatch over TriggerKind rows. All args broadcast over [B,K]
  (pos/speed are the ego's, broadcast to every spec row)."""
  return jnp.select(
      [kind == TriggerKind.DISTANCE,
       kind == TriggerKind.TIME_TO_ARRIVAL,
       kind == TriggerKind.REGION,
       kind == TriggerKind.VELOCITY],
      [in_trigger_distance(pos, target, dist),
       in_time_to_arrival(pos, speed, target, param),
       in_trigger_region(pos, target, half_extent),
       trigger_velocity(speed, param)],
      default=False)
