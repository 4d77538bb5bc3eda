"""End-to-end object-level pipeline: expert datagen -> PlanT IL training ->
closed-loop PlanT evaluation (BASELINE config 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.agents.plant_agent import (make_plant_policy,
                                                 plant_agent_reset)
from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.models.plant import PlanT, micro_plant
from carla_garage_tpu.sim.datagen import collect_expert_frames
from carla_garage_tpu.sim.episode import rollout
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch
from carla_garage_tpu.train.plant_train import (build_plant_dataset,
                                                train_plant)
import dataclasses


def micro_tokens_config():
  return dataclasses.replace(micro_plant(), max_objects=16,
                             num_route_points=8)


def test_datagen_and_training_and_closed_loop():
  pcfg = micro_tokens_config()
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=2, seed=2, n_vehicles=4, n_walkers=1)

  # --- datagen: 60 frames = 300 ticks of expert driving ---
  collect = jax.jit(lambda sc, st: collect_expert_frames(
      CFG, maps, lanes, sc, st, n_frames=60))
  final, frames = collect(scene, state)
  assert frames.ego_pos.shape[:2] == (60, 2)
  assert bool(jnp.any(frames.alive))

  # --- dataset ---
  ds = build_plant_dataset(CFG, pcfg, frames, scene)
  assert len(ds) > 50, f"too few valid samples: {len(ds)}"
  assert ds.boxes.shape[1] == pcfg.max_objects
  assert ds.route.shape[1] == pcfg.num_route_points
  # forecast labels exist for at least some tracked objects
  assert (ds.forecast_label != -999).any()
  # waypoint labels should be mostly forward (x >= small negative)
  assert float(np.mean(ds.wp_label[..., 0] > -1.0)) > 0.95

  # --- a few training steps reduce the loss ---
  model, params, hist = train_plant(CFG, pcfg, ds, steps=60, batch_size=32,
                                    lr=1e-3, log_every=59)
  assert hist[-1]["loss"] < hist[0]["loss"]

  # --- closed loop with the (barely) trained model: must run, not crash ---
  policy = make_plant_policy(model, params, pcfg)
  state2 = state.replace(agent=plant_agent_reset(CFG, 2))
  run = jax.jit(lambda sc, st: rollout(CFG, maps, lanes, sc, st, 50,
                                       policy=policy))
  out = run(scene, state2)
  assert out.ego.pos.shape == (2, 2)
  assert bool(jnp.all(out.tick == 50) | jnp.any(out.done))


def test_plant_creep_recovery():
  """Stuck -> creep (sensor_agent.py:561-599 semantics at object level):
  a long-stuck ego creeps when the front box is clear and full-brakes
  (re-arming the creep) when a vehicle occupies it."""
  pcfg = micro_tokens_config()
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=2, seed=3, n_vehicles=4, n_walkers=1)
  model = PlanT(pcfg)
  params = model.init(
      jax.random.key(0),
      jnp.zeros((2, pcfg.max_objects, pcfg.num_attributes)),
      jnp.zeros((2, pcfg.max_objects), jnp.int32),
      jnp.zeros((2, pcfg.num_route_points, 2)),
      jnp.zeros((2,)), jnp.zeros((2,)), jnp.zeros((2,), bool),
      jnp.zeros((2,)))
  policy = make_plant_policy(model, params, pcfg, direct=True)

  ego = state.ego
  fwd = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)], -1)
  veh = state.vehicles
  # env 1: park an NPC dead ahead, inside the creep safety box
  blocker = ego.pos + fwd * (CFG.sim.ego_extent_x + 1.25)
  pos = veh.pos.at[1, 0].set(blocker[1])
  yaw = veh.yaw.at[1, 0].set(ego.yaw[1])
  valid = veh.valid.at[:, 0].set(jnp.array([False, True]))
  ag = plant_agent_reset(CFG, 2).replace(
      stuck_count=jnp.full((2,), CFG.expert.stuck_threshold + 1, jnp.int32))
  state2 = state.replace(
      ego=ego.replace(speed=jnp.zeros((2,))),
      vehicles=veh.replace(pos=pos, yaw=yaw, valid=valid),
      agent=ag)
  ctrl, extra = policy(CFG, maps, scene, state2, jax.random.key(1))
  assert abs(float(ctrl.throttle[0]) - CFG.expert.creep_throttle) < 1e-6
  assert float(ctrl.brake[0]) == 0.0
  assert float(ctrl.brake[1]) == 1.0
  # the obstructed creep stays armed for when the box clears
  assert int(extra["agent"].force_move[1]) == CFG.expert.creep_duration
  # the clear-side creep consumed one frame
  assert int(extra["agent"].stuck_count[0]) == 0


def test_kendall_weights_and_schedule():
  """Kendall learned loss weighting + multistep LR schedule train and
  reduce the loss (train.py:384-456, :588-598 wiring)."""
  from carla_garage_tpu.train.plant_train import PlantDataset
  pcfg = dataclasses.replace(micro_plant(), max_objects=6,
                             num_route_points=4)
  rng = np.random.default_rng(0)
  n = 64
  ds = PlantDataset(
      boxes=rng.normal(size=(n, 6, 7)).astype(np.float32),
      box_types=rng.integers(0, 4, size=(n, 6)).astype(np.int32),
      route=rng.normal(size=(n, 4, 2)).astype(np.float32),
      light=rng.integers(0, 2, size=(n,)).astype(np.float32),
      stop=np.zeros((n,), np.float32),
      junction=np.zeros((n,), np.float32),
      velocity=rng.uniform(0, 8, size=(n,)).astype(np.float32),
      target_point=rng.normal(size=(n, 2)).astype(np.float32),
      wp_label=rng.normal(size=(n, 8, 2)).astype(np.float32),
      speed_label=rng.integers(0, 4, size=(n,)).astype(np.int32),
      ckpt_label=rng.normal(size=(n, 4, 2)).astype(np.float32),
      forecast_label=np.full((n, 6, 7), -999, np.int32))
  model, params, hist = train_plant(
      CFG, pcfg, ds, steps=40, batch_size=16, lr=1e-3, log_every=39,
      schedule="multistep", learn_loss_weights=True, val_fraction=0.25)
  assert hist[-1]["loss"] < hist[0]["loss"]
  assert "val_loss" in hist[-1]
