"""Episode → leaderboard scores (StatisticsManager re-design).

Converts the vectorized CriteriaState accumulators into the official CARLA
leaderboard metrics (statistics_manager_local.py:123-241):
  score_route    RC  = route completion % (with outside-lane discount)
  score_penalty  IS  = product of infraction penalties
  score_composed DS  = RC × IS
plus global means and infractions/km, all as array reductions.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.structs import CriteriaState


@struct.dataclass
class RouteScores:
  score_route: jnp.ndarray      # [B] percent 0-100
  score_penalty: jnp.ndarray    # [B] 0-1
  score_composed: jnp.ndarray   # [B] percent
  completed: jnp.ndarray        # [B] bool
  infractions_per_km: dict


def compute_scores(cfg: GlobalConfig, cr: CriteriaState,
                   route_len_m: jnp.ndarray) -> RouteScores:
  c = cfg.criteria
  # OutsideRouteLanes discounts route completion by the % of distance driven
  # off-lane (atomic_criteria_local.py:1040-1233 → statistics penalty
  # `1 - percentage/100` applied multiplicatively to the penalty product).
  off_frac = jnp.where(cr.driven_m > 0, cr.outside_lane_m / cr.driven_m, 0.0)
  penalty = cr.penalty * (1.0 - off_frac)
  rc = cr.route_completion * 100.0
  completed = cr.route_completion >= c.min_route_completion
  rc = jnp.where(completed, 100.0, rc)
  ds = jnp.maximum(rc * penalty, 0.0)
  km = jnp.maximum(cr.route_completion * route_len_m / 1000.0, 1e-3)
  inf_km = {
      'collisions_vehicle': cr.n_collision_vehicle / km,
      'collisions_pedestrian': cr.n_collision_walker / km,
      'collisions_layout': cr.n_collision_static / km,
      'red_light': cr.n_red_light / km,
      'stop_infraction': cr.n_stop_sign / km,
  }
  return RouteScores(score_route=rc, score_penalty=penalty,
                     score_composed=ds, completed=completed,
                     infractions_per_km=inf_km)


def global_stats(scores: RouteScores) -> dict:
  """Benchmark aggregation (compute_global_statistics :210-241)."""
  return {
      'driving_score': jnp.mean(scores.score_composed),
      'route_completion': jnp.mean(scores.score_route),
      'infraction_score': jnp.mean(scores.score_penalty),
      'num_routes': scores.score_route.shape[0],
  }
