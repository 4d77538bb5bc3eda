"""Adversarial scenario engine — srunner's 7 scenario types as array FSMs.

The reference instantiates py_trees behavior subtrees per scenario
(route_scenario_local.py:55-66 maps Scenario1..10 to classes;
ScenarioTriggerer :2364-2460 fires them when the ego nears trigger points).
Here each scenario is a row in fixed-shape spec arrays; triggering and the
scripted actor behaviors are masked per-tick updates — no trees, no
blackboard, same observable behavior:

  CONTROL_LOSS (Scenario1, control_loss.py:29-121): inject a steering
    disturbance on the ego for a short window.
  FOLLOW_LEADING (Scenario2) / OTHER_LEADING (Scenario5): activate an NPC
    ahead on the ego route that brakes abruptly / drives slowly.
  CROSSING_WALKER (Scenario3/4, object_crash_*.py): a walker crosses the
    road when the ego approaches (implemented in traffic.walker_step via
    WalkerSpec; listed here for inventory completeness).
  OPPOSITE_DIRECTION (Scenario6): an NPC drives toward the ego in the
    opposite lane for a stretch.
  JUNCTION_CROSSING (Scenario7-10): an NPC crosses the junction when the
    ego enters its trigger region.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.structs import Scene, SimState


class ScenarioType:
  NONE = 0
  CONTROL_LOSS = 1
  FOLLOW_LEADING = 2
  CROSSING_WALKER = 3
  OTHER_LEADING = 5
  OPPOSITE_DIRECTION = 6
  JUNCTION_CROSSING = 7


@struct.dataclass
class ScenarioSpecs:
  """Static per-episode scenario definitions. [B,K] slots.

  trigger_kind selects the arming predicate (sim/triggers.py — the
  atomic_trigger_conditions library): 0 distance (trigger_dist), 1
  time-to-arrival (trigger_param seconds), 2 region (trigger_extent
  half-sizes), 3 ego-velocity (trigger_param m/s)."""
  kind: jnp.ndarray          # [B,K] int32 ScenarioType
  trigger_pos: jnp.ndarray   # [B,K,2] world position that arms the scenario
  trigger_dist: jnp.ndarray  # [B,K]
  trigger_kind: jnp.ndarray  # [B,K] int32 TriggerKind
  trigger_param: jnp.ndarray  # [B,K] TTA seconds / velocity threshold
  trigger_extent: jnp.ndarray  # [B,K,2] region half-extent
  actor_slot: jnp.ndarray    # [B,K] int32 vehicle slot it controls (-1 none)
  duration: jnp.ndarray      # [B,K] int32 ticks the effect lasts
  magnitude: jnp.ndarray     # [B,K] effect strength (steer noise amplitude,
  valid: jnp.ndarray         # [B,K]    brake level, speed, ...)


@struct.dataclass
class ScenarioState:
  triggered: jnp.ndarray     # [B,K] bool (latched)
  ticks_active: jnp.ndarray  # [B,K] int32
  wait_ticks: jnp.ndarray    # [B,K] int32 — ego stopped behind an
  #                            untriggered scripted actor (failsafe clock)


def scenarios_reset(B: int, K: int) -> ScenarioState:
  return ScenarioState(triggered=jnp.zeros((B, K), bool),
                       ticks_active=jnp.zeros((B, K), jnp.int32),
                       wait_ticks=jnp.zeros((B, K), jnp.int32))


def make_empty_specs(B: int, K: int) -> ScenarioSpecs:
  return ScenarioSpecs(
      kind=jnp.zeros((B, K), jnp.int32),
      trigger_pos=jnp.zeros((B, K, 2)),
      trigger_dist=jnp.full((B, K), 15.0),
      trigger_kind=jnp.zeros((B, K), jnp.int32),
      trigger_param=jnp.zeros((B, K)),
      trigger_extent=jnp.full((B, K, 2), 5.0),
      actor_slot=jnp.full((B, K), -1, jnp.int32),
      duration=jnp.full((B, K), 60, jnp.int32),
      magnitude=jnp.zeros((B, K)),
      valid=jnp.zeros((B, K), bool))


def scenario_step(cfg: GlobalConfig, specs: ScenarioSpecs,
                  sstate: ScenarioState, state: SimState, rng):
  """Advance triggers; return (new ScenarioState, effects dict).

  effects:
    steer_noise [B] — additive ego steering disturbance (CONTROL_LOSS)
    npc_brake_override [B,V] — force an NPC to brake (FOLLOW_LEADING)
    npc_speed_cap [B,V] — cap an NPC's target speed (OTHER_LEADING)
  """
  import jax
  ego = state.ego
  B, K = specs.kind.shape
  V = state.vehicles.yaw.shape[1]

  from carla_garage_tpu.sim.triggers import evaluate
  armed = specs.valid & evaluate(
      specs.trigger_kind, ego.pos[:, None], ego.speed[:, None],
      specs.trigger_pos, specs.trigger_dist, specs.trigger_param,
      specs.trigger_extent)
  triggered = sstate.triggered | armed

  # Force-trigger failsafe: a scripted actor waits parked until its trigger
  # arms, but the ego can end up stopped right behind it without ever
  # satisfying the predicate (e.g. the route passes the same junction on a
  # different leg than the trigger guards, or a TTA trigger whose TTA -> inf
  # once the ego hazard-brakes for the parked actor itself — a circular
  # deadlock observed on LAV route 12). The reference never hits this
  # because its ScenarioTriggerer places triggers on the ego's exact route;
  # our synthesized placements can alias. If the ego has been stopped within
  # a car-length-ish gap behind an untriggered waiting actor for 3 s, fire
  # the scenario so the actor drives off.
  waiting_kind = specs.valid & ~triggered & (
      (specs.kind == ScenarioType.JUNCTION_CROSSING) |
      (specs.kind == ScenarioType.OPPOSITE_DIRECTION) |
      (specs.kind == ScenarioType.FOLLOW_LEADING) |
      (specs.kind == ScenarioType.OTHER_LEADING))
  has_actor = specs.actor_slot >= 0
  slot_oh_f = (jax.nn.one_hot(jnp.clip(specs.actor_slot, 0, V - 1), V) *
               has_actor[..., None])
  actor_pos = jnp.einsum('bkv,bvc->bkc', slot_oh_f, state.vehicles.pos)
  rel = actor_pos - ego.pos[:, None]                    # [B,K,2]
  gap = jnp.linalg.norm(rel, axis=-1)
  fwd = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)], -1)   # [B,2]
  ahead = jnp.einsum('bkc,bc->bk', rel, fwd) > 0.0
  blocking = (waiting_kind & has_actor & ahead & (gap < 12.0) &
              (ego.speed[:, None] < 0.3))
  wait_ticks = jnp.where(blocking, sstate.wait_ticks + 1, 0)
  triggered = triggered | (blocking & (wait_ticks >= 3 * cfg.sim.fps))

  active = triggered & (sstate.ticks_active < specs.duration)
  ticks = jnp.where(active, sstate.ticks_active + 1, sstate.ticks_active)

  # CONTROL_LOSS: steering disturbance while active
  is_cl = active & (specs.kind == ScenarioType.CONTROL_LOSS)
  noise = jax.random.normal(rng, (B, K)) * specs.magnitude
  steer_noise = jnp.sum(jnp.where(is_cl, noise, 0.0), axis=-1)

  # actor-slot scatter helper: one-hot over V per scenario row
  slot_oh = jax.nn.one_hot(jnp.clip(specs.actor_slot, 0, V - 1), V,
                           dtype=bool) & (specs.actor_slot >= 0)[..., None]

  is_brake = active & (specs.kind == ScenarioType.FOLLOW_LEADING)
  npc_brake = jnp.any(slot_oh & is_brake[..., None], axis=1)      # [B,V]

  is_slow = active & (specs.kind == ScenarioType.OTHER_LEADING)
  slow_cap = jnp.where(is_slow[..., None] & slot_oh,
                       specs.magnitude[..., None], jnp.inf)
  npc_speed_cap = jnp.min(slow_cap, axis=1)                        # [B,V]

  # Scripted actors sit parked (speed cap 0) until triggered, then drive:
  # JUNCTION_CROSSING crosses the junction, OPPOSITE_DIRECTION starts
  # toward the ego on the opposing lane, FOLLOW_LEADING becomes the
  # braking leader, OTHER_LEADING the slow leader.
  is_wait = waiting_kind & ~triggered   # post-failsafe: forced rows drive
  wait_cap = jnp.where(is_wait[..., None] & slot_oh, 0.0, jnp.inf)
  npc_speed_cap = jnp.minimum(npc_speed_cap, jnp.min(wait_cap, axis=1))

  return (ScenarioState(triggered=triggered, ticks_active=ticks,
                        wait_ticks=wait_ticks),
          {"steer_noise": steer_noise,
           "npc_brake_override": npc_brake,
           "npc_speed_cap": npc_speed_cap})
