"""Episode loop: the ScenarioManager tick loop as one jitted scan.

The reference's hot loop (scenario_manager_local.py:138-186) crosses the
client/CARLA-server process boundary 3×/tick at 20 Hz. Here one tick is one
fused XLA step over the whole batch: expert/policy control → ego dynamics →
NPC traffic → walkers → criteria; episodes that finish freeze in place
(masking, not branching) so a whole benchmark runs as a single lax.scan.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.maps.town_map import LaneGraph, MapStack
from carla_garage_tpu.sim.criteria import criteria_step, episode_done
from carla_garage_tpu.sim.geometry import normalize_angle
from carla_garage_tpu.sim.dynamics import bicycle_step
from carla_garage_tpu.sim.expert import Control, expert_step
from carla_garage_tpu.sim.traffic import traffic_step, walker_step
from carla_garage_tpu.structs import Scene, SimState

# Control policy signature:
#   (cfg, maps, scene, state, rng) -> (Control, dict of SimState field updates)
# The expert returns {"expert": ExpertState}; learned agents return
# {"agent": <their carry pytree>}.
PolicyFn = Callable


def freeze_done(done: jnp.ndarray, old, new):
  """Keep `old` wherever the episode is done. done [B]; leaves [B,...]."""
  def sel(o, n):
    d = done.reshape(done.shape + (1,) * (n.ndim - 1))
    return jnp.where(d, o, n)
  return jax.tree.map(sel, old, new)


def sim_step(cfg: GlobalConfig, maps: MapStack, lanes: LaneGraph,
             scene: Scene, state: SimState,
             policy: PolicyFn = expert_step,
             policy_params=None) -> SimState:
  """Advance the whole batch one tick.

  policy_params: optional pytree (e.g. model weights) forwarded to the
  policy as a 6th argument. Passing weights THROUGH the jit boundary
  instead of closing over them keeps them out of the compiled program's
  constants (multi-MB constants make remote XLA compiles pathological)."""
  rng, rng_step, rng_scn = jax.random.split(state.rng, 3)
  if policy_params is not None:
    control, updates = policy(cfg, maps, scene, state, rng_step,
                              policy_params)
  else:
    control, updates = policy(cfg, maps, scene, state, rng_step)

  # scenario triggers + effects (srunner behavior-tree analog)
  effects = None
  if scene.scenarios != () and state.scenario != ():
    from carla_garage_tpu.sim.scenarios import scenario_step
    new_scn, effects = scenario_step(cfg, scene.scenarios, state.scenario,
                                     state, rng_scn)
    control = control.replace(steer=control.steer +
                              effects["steer_noise"])
    updates = dict(updates, scenario=new_scn)

  # all agents advance simultaneously (world.tick semantics)
  pos, yaw, speed = bicycle_step(state.ego.pos, state.ego.yaw,
                                 state.ego.speed, control.steer,
                                 control.throttle, control.brake, cfg.sim)
  new_ego = state.ego.replace(pos=pos, yaw=normalize_angle(yaw), speed=speed)
  new_veh = traffic_step(cfg, lanes, scene, state, effects)
  new_wlk = walker_step(cfg, scene, state)

  moved = state.replace(ego=new_ego, vehicles=new_veh, walkers=new_wlk,
                        tick=state.tick + 1, **updates)
  new_criteria = criteria_step(cfg, maps, scene, state.ego.pos, moved)
  moved = moved.replace(criteria=new_criteria)
  moved = moved.replace(done=state.done | episode_done(cfg, moved))

  frozen = freeze_done(state.done, state, moved.replace(rng=state.rng))
  return frozen.replace(rng=rng, done=moved.done)


def rollout(cfg: GlobalConfig, maps: MapStack, lanes: LaneGraph,
            scene: Scene, state: SimState, n_ticks: int,
            policy: PolicyFn = expert_step, policy_params=None) -> SimState:
  """Run n_ticks of simulation as a lax.scan (jit-compatible)."""
  def body(st, _):
    return sim_step(cfg, maps, lanes, scene, st, policy,
                    policy_params), None
  final, _ = jax.lax.scan(body, state, None, length=n_ticks)
  return final


def rollout_recorded(cfg: GlobalConfig, maps: MapStack, lanes: LaneGraph,
                     scene: Scene, state: SimState, n_ticks: int,
                     every: int = 10, policy: PolicyFn = expert_step,
                     policy_params=None):
  """Rollout that also records a decimated trajectory log — the
  ScenarioLogger analog (scenario_logger.py:13-82: every 10th frame,
  nearby-actor ROI) for replay clips and infraction maps.

  Returns (final_state, traj dict of [T',B,...] arrays) with
  T' = n_ticks // every snapshots: ego (x,y,yaw,speed), the 8 nearest
  vehicles and 2 nearest walkers (position, yaw, valid)."""
  NV, NW = 8, 2

  def snap(st: SimState):
    d_v = jnp.linalg.norm(st.vehicles.pos - st.ego.pos[:, None], axis=-1)
    d_v = jnp.where(st.vehicles.valid, d_v, jnp.inf)
    iv = jnp.argsort(d_v, axis=-1)[:, :NV]
    d_w = jnp.linalg.norm(st.walkers.pos - st.ego.pos[:, None], axis=-1)
    d_w = jnp.where(st.walkers.valid, d_w, jnp.inf)
    iw = jnp.argsort(d_w, axis=-1)[:, :NW]
    gv = lambda a: jnp.take_along_axis(
        a, iv[..., None] if a.ndim == 3 else iv, 1)
    gw = lambda a: jnp.take_along_axis(
        a, iw[..., None] if a.ndim == 3 else iw, 1)
    return dict(
        ego=jnp.concatenate([st.ego.pos, st.ego.yaw[:, None],
                             st.ego.speed[:, None]], -1),
        veh_pos=gv(st.vehicles.pos), veh_yaw=gv(st.vehicles.yaw),
        veh_valid=gv(st.vehicles.valid) &
        jnp.isfinite(jnp.take_along_axis(d_v, iv, 1)),
        wlk_pos=gw(st.walkers.pos),
        wlk_valid=gw(st.walkers.valid) &
        jnp.isfinite(jnp.take_along_axis(d_w, iw, 1)),
        tick=st.tick, alive=~st.done)

  def frame(st, _):
    st = jax.lax.fori_loop(
        0, every, lambda i, s2: sim_step(cfg, maps, lanes, scene, s2,
                                         policy, policy_params), st)
    return st, snap(st)

  final, traj = jax.lax.scan(frame, state, None, length=n_ticks // every)
  return final, traj


def rollout_chunked(cfg: GlobalConfig, maps: MapStack, lanes: LaneGraph,
                    scene: Scene, state: SimState, max_ticks: int,
                    chunk: int = 256, policy: PolicyFn = expert_step,
                    watchdog_s: float | None = 1800.0,
                    policy_params=None) -> SimState:
  """Host-side chunked rollout with early exit once every episode is done.

  Long routes need ~24k ticks (SURVEY.md §7 risks); a chunked while-loop
  bounds compile time and skips tail work for finished batches.

  watchdog_s arms a hang watchdog around every host-blocking device call
  (the ScenarioManager sim/agent watchdog analog,
  scenario_manager_local.py:64-70): a wedged TPU runtime or a pathological
  compile raises KeyboardInterrupt on the main thread instead of hanging a
  benchmark job forever. The default covers a cold first-chunk compile.
  """
  from carla_garage_tpu.utils.watchdog import Watchdog

  @jax.jit
  def run_chunk(maps_, lanes_, scene_, state_, params_):
    # maps/lanes/model params as ARGUMENTS: town rasters and weight trees
    # can be GBs — closing over them would embed them as compile-time
    # constants in the executable
    return rollout(cfg, maps_, lanes_, scene_, state_, chunk, policy,
                   policy_params=params_)

  wd = Watchdog(watchdog_s) if watchdog_s else None
  if wd:
    wd.start()
  try:
    ticks = 0
    while ticks < max_ticks:
      state = run_chunk(maps, lanes, scene, state, policy_params)
      jax.block_until_ready(state.done)
      if wd:
        wd.update()                      # re-arm once per completed chunk
      ticks += chunk
      if bool(jnp.all(state.done)):
        break
  finally:
    if wd:
      wd.stop()
  return state
