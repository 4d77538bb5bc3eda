"""Windowed route-pointer planner — vectorized RoutePlanner.

The reference pops waypoints off a deque as the ego passes them
(nav_planner.RoutePlanner.run_step:100-127). Deques don't vectorize; instead
we keep the full padded route array fixed and advance an int32 pointer using a
fixed-size look-ahead window — identical pop decisions, O(window) masked ops,
fully batchable under vmap and inside lax.scan forecast rollouts.

Pop rule (matching the reference exactly):
  consider candidates i = ptr+1 .. while the cumulative inter-point distance
  *before* i stays <= max_distance; among candidates whose distance to the ego
  is <= min_distance pick the FARTHEST (first on ties); advance ptr by that
  many, never leaving fewer than 3 un-popped points.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from carla_garage_tpu.structs import PlannerState


@dataclasses.dataclass(frozen=True)
class PlannerParams:
  min_distance: float
  max_distance: float
  window: int = 64


def planner_reset(batch_shape=()) -> PlannerState:
  return PlannerState(idx=jnp.zeros(batch_shape, jnp.int32),
                      is_last=jnp.zeros(batch_shape, bool))


def planner_step(state: PlannerState, points: jnp.ndarray,
                 seg_len: jnp.ndarray, num_valid: jnp.ndarray,
                 pos: jnp.ndarray, p: PlannerParams) -> PlannerState:
  """Advance the route pointer. Unbatched core (vmap over B).

  points [R,2], seg_len [R] (seg_len[i] = |points[i]-points[i-1]|, [0]=0),
  num_valid [] int32, pos [2].
  """
  remaining = num_valid - state.idx
  w = jnp.arange(1, p.window + 1)                       # candidate offsets j
  q = state.idx + w                                     # absolute indices
  in_route = q < num_valid
  qc = jnp.clip(q, 0, points.shape[0] - 1)
  seg = jnp.where(in_route, seg_len[qc], 0.0)
  # cumulative distance BEFORE candidate j: sum of seg_len[ptr+1 .. ptr+j-1]
  cum_before = jnp.cumsum(seg) - seg
  considered = in_route & (cum_before <= p.max_distance)
  d = jnp.linalg.norm(points[qc] - pos, axis=-1)
  eligible = considered & (d <= p.min_distance)
  score = jnp.where(eligible, d, -jnp.inf)
  best = jnp.argmax(score)                              # first max on ties
  to_pop = jnp.where(jnp.any(eligible), w[best], 0)
  # reference pops while len > 2, so the minimum remaining length is 2
  max_pop = jnp.maximum(remaining - 2, 0)
  new_idx = state.idx + jnp.minimum(to_pop, max_pop)
  is_last = (num_valid - new_idx) <= 2
  return PlannerState(idx=new_idx.astype(jnp.int32), is_last=is_last)


def route_lookup(points: jnp.ndarray, cmd: jnp.ndarray,
                 num_valid: jnp.ndarray, idx: jnp.ndarray, offset: int):
  """route[offset] relative to the pointer, clamped to the last valid point.

  Mirrors the callers' `route[1] if len(route) > 1 else route[0]` patterns
  (autopilot.py:268, :311-318)."""
  j = jnp.minimum(idx + offset, jnp.maximum(num_valid - 1, 0))
  j = jnp.clip(j, 0, points.shape[0] - 1)
  return points[j], cmd[j]
