"""Scenario engine tests: triggers fire, effects apply, expert survives."""

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.sim.episode import rollout
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch
from carla_garage_tpu.sim.scenarios import (ScenarioType, make_empty_specs,
                                            scenarios_reset)


def test_control_loss_and_follow_leading():
  B, K = 2, 4
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=B, seed=1, n_vehicles=4, n_walkers=0)
  specs = make_empty_specs(B, CFG.sim.max_vehicles * 0 + K)
  # scenario 0: CONTROL_LOSS triggered 40 m down the route
  trig = np.asarray(scene.route.points)[:, 40]
  specs = specs.replace(
      kind=specs.kind.at[:, 0].set(ScenarioType.CONTROL_LOSS),
      trigger_pos=specs.trigger_pos.at[:, 0].set(jnp.asarray(trig)),
      magnitude=specs.magnitude.at[:, 0].set(0.2),
      duration=specs.duration.at[:, 0].set(40),
      valid=specs.valid.at[:, 0].set(True))
  # scenario 1: FOLLOW_LEADING — NPC slot 0 brakes when ego nears point 80
  trig2 = np.asarray(scene.route.points)[:, 80]
  specs = specs.replace(
      kind=specs.kind.at[:, 1].set(ScenarioType.FOLLOW_LEADING),
      trigger_pos=specs.trigger_pos.at[:, 1].set(jnp.asarray(trig2)),
      actor_slot=specs.actor_slot.at[:, 1].set(0),
      duration=specs.duration.at[:, 1].set(200),
      valid=specs.valid.at[:, 1].set(True))
  scene = scene.replace(scenarios=specs)
  state = state.replace(scenario=scenarios_reset(B, K))

  run = jax.jit(lambda sc, st: rollout(CFG, maps, lanes, sc, st, 256))
  s = state
  for _ in range(6):
    s = run(scene, s)
    if bool(jnp.all(s.done)):
      break
  # triggers latched
  assert bool(jnp.all(s.scenario.triggered[:, 0]))
  assert bool(jnp.all(s.scenario.ticks_active[:, 0] >= 40))
  # no collisions despite the disturbance + braking leader
  assert int(jnp.sum(s.criteria.n_collision_vehicle)) == 0
  assert np.all(np.asarray(s.criteria.route_completion) > 0.5)


def test_blocked_ego_force_triggers_waiting_actor():
  """Route-overlap deadlock failsafe: a parked scripted actor whose trigger
  never arms must be force-triggered once the ego has idled behind it 3 s
  (observed on LAV route 12: the route crossed the guarded junction on a
  different leg, so the TTA trigger could never fire)."""
  from carla_garage_tpu.sim.scenarios import scenario_step
  B, K = 1, 4
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=B, seed=3, n_vehicles=4, n_walkers=0)
  specs = make_empty_specs(B, K).replace(
      kind=jnp.zeros((B, K), jnp.int32).at[:, 0].set(
          ScenarioType.JUNCTION_CROSSING),
      # trigger 1 km away: unreachable, would deadlock without the failsafe
      trigger_pos=jnp.zeros((B, K, 2)).at[:, 0].set(
          state.ego.pos[0] + jnp.asarray([1000.0, 0.0])),
      actor_slot=jnp.full((B, K), -1, jnp.int32).at[:, 0].set(0),
      valid=jnp.zeros((B, K), bool).at[:, 0].set(True))
  # park NPC 0 seven meters dead ahead of a stopped ego
  ahead = state.ego.pos + 7.0 * jnp.stack(
      [jnp.cos(state.ego.yaw), jnp.sin(state.ego.yaw)], -1)
  st = state.replace(
      ego=state.ego.replace(speed=jnp.zeros_like(state.ego.speed)),
      vehicles=state.vehicles.replace(
          pos=state.vehicles.pos.at[:, 0].set(ahead),
          speed=state.vehicles.speed.at[:, 0].set(0.0),
          valid=state.vehicles.valid.at[:, 0].set(True)),
      scenario=scenarios_reset(B, K))

  step = jax.jit(lambda sst: scenario_step(CFG, specs, sst, st,
                                           jax.random.key(0)))
  sst = st.scenario
  for t in range(3 * CFG.sim.fps - 1):
    sst, eff = step(sst)
    # while waiting: untriggered, actor speed-capped to 0
    assert not bool(sst.triggered[0, 0]), f"triggered early at tick {t}"
    assert float(eff["npc_speed_cap"][0, 0]) == 0.0
  sst, eff = step(sst)
  assert bool(sst.triggered[0, 0])                          # failsafe fired
  assert float(eff["npc_speed_cap"][0, 0]) > 1e6            # cap lifted
