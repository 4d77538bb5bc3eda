"""Criteria semantics unit tests on hand-built scenes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG, longest6_config
from carla_garage_tpu.sim.criteria import criteria_reset, criteria_step
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch
from carla_garage_tpu.structs import LightState


def _setup():
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=1, seed=3, n_vehicles=1, n_walkers=1)
  return maps, scene, state


def _step_at(maps, scene, state, pos, speed, tick=100, yaw=None):
  """Place the ego and run one criteria update. yaw defaults to the
  current ego yaw; red-light/stop criteria only consider trigger boxes
  FACING the ego (per-approach semantics), so tests aim the ego at the
  box they exercise."""
  ego = state.ego.replace(pos=jnp.asarray([pos], jnp.float32),
                          speed=jnp.asarray([speed], jnp.float32))
  if yaw is not None:
    ego = ego.replace(yaw=jnp.asarray([yaw], jnp.float32))
  st = state.replace(ego=ego, tick=jnp.asarray([tick], jnp.int32))
  cr = criteria_step(CFG, maps, scene, st.ego.pos, st)
  return st.replace(criteria=cr)


def test_red_light_crossing_and_latch():
  maps, scene, state = _setup()
  lp = np.asarray(scene.lights.pos[0])
  lv = np.asarray(scene.lights.valid[0])
  li = int(np.nonzero(lv)[0][0])
  light_pos = lp[li]
  light_yaw = float(np.asarray(scene.lights.yaw[0])[li])
  # pick a time when this light is RED
  for t in range(0, 600, 10):
    st = state.replace(tick=jnp.asarray([t], jnp.int32))
    if int(scene.lights.state_at(st.time_s)[0, li]) == LightState.RED:
      break
  # moving through the trigger while red: infraction once
  st = _step_at(maps, scene, state, light_pos, speed=5.0, tick=t,
                yaw=light_yaw)
  assert int(st.criteria.n_red_light[0]) == 1
  # still inside next tick: latched, no second count
  st2 = _step_at(maps, scene, st, light_pos, speed=5.0, tick=t,
                 yaw=light_yaw)
  assert int(st2.criteria.n_red_light[0]) == 1
  # standing still inside while red: no infraction (crossing = moving)
  st3 = _step_at(maps, scene, state, light_pos, speed=0.0, tick=t,
                 yaw=light_yaw)
  assert int(st3.criteria.n_red_light[0]) == 0
  # crossing while red but NOT facing the light (perpendicular street):
  # not an infraction for this approach
  st4 = _step_at(maps, scene, state, light_pos, speed=5.0, tick=t,
                 yaw=light_yaw + np.pi / 2)
  assert int(st4.criteria.n_red_light[0]) == 0


def test_stop_sign_fsm():
  maps, scene, state = _setup()
  sp = np.asarray(scene.stops.pos[0])
  sv = np.asarray(scene.stops.valid[0])
  si = int(np.nonzero(sv)[0][0])
  stop_pos = sp[si]
  stop_yaw = float(np.asarray(scene.stops.yaw[0])[si])
  far = stop_pos + np.array([50.0, 50.0])
  # drive through without stopping -> infraction when leaving
  st = _step_at(maps, scene, state, stop_pos, speed=5.0, yaw=stop_yaw)
  assert int(st.criteria.n_stop_sign[0]) == 0     # still inside: pending
  st = _step_at(maps, scene, st, far, speed=5.0, yaw=stop_yaw)
  assert int(st.criteria.n_stop_sign[0]) == 1
  # enter, stop, leave -> satisfied, no infraction
  st = _step_at(maps, scene, state, stop_pos, speed=5.0, yaw=stop_yaw)
  st = _step_at(maps, scene, st, stop_pos, speed=0.0, yaw=stop_yaw)
  st = _step_at(maps, scene, st, far, speed=5.0, yaw=stop_yaw)
  assert int(st.criteria.n_stop_sign[0]) == 0


def test_collision_dedup_window():
  """Same-actor re-contact within collision_dedup_seconds is not
  re-counted; after the window expires it is (atomic_criteria_local.py
  :300-437 per-actor temporal dedup)."""
  maps, scene, state = _setup()
  vp = np.asarray(state.vehicles.pos[0])
  vi = int(np.nonzero(np.asarray(state.vehicles.valid[0]))[0][0])
  hit = vp[vi]
  far = hit + np.array([200.0, 200.0])
  st = _step_at(maps, scene, state, hit, speed=5.0)
  assert int(st.criteria.n_collision_vehicle[0]) == 1
  # contact persists: no second count
  st = _step_at(maps, scene, st, hit, speed=5.0)
  assert int(st.criteria.n_collision_vehicle[0]) == 1
  # brief separation + re-contact inside the dedup window: still 1
  st = _step_at(maps, scene, st, far, speed=5.0)
  st = _step_at(maps, scene, st, hit, speed=5.0)
  assert int(st.criteria.n_collision_vehicle[0]) == 1
  # cooldown expired (forced): a new contact is a new collision
  st = _step_at(maps, scene, st, far, speed=5.0)
  st = st.replace(criteria=st.criteria.replace(
      veh_overlap=jnp.zeros_like(st.criteria.veh_overlap)))
  st = _step_at(maps, scene, st, hit, speed=5.0)
  assert int(st.criteria.n_collision_vehicle[0]) == 2


def test_blocked_timer():
  maps, scene, state = _setup()
  pos = np.asarray(state.ego.pos[0])
  st = state
  n = int(CFG.criteria.blocked_seconds * CFG.sim.fps) + 2
  cr = st.criteria.replace(
      blocked_ticks=jnp.asarray([n], jnp.int32))
  st = st.replace(criteria=cr)
  st = _step_at(maps, scene, st, pos, speed=0.0)
  assert bool(st.criteria.blocked[0])


def test_longest6_stop_penalty_is_one():
  cfg = longest6_config()
  assert cfg.criteria.penalty_stop == 1.0
  assert CFG.criteria.penalty_stop == 0.8
