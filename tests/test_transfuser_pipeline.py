"""End-to-end sensor pipeline: expert datagen -> TransFuser IL training
(on-the-fly rendered sensors + labels) -> loss decreases.

Uses a reduced sensor config (128^2 LiDAR grid, 32x128 camera) to keep CPU
compile time small; the full-size path runs in scripts/train_transfuser.py.
"""

import dataclasses

import jax
import jax.numpy as jnp

from carla_garage_tpu.config import DEFAULT_CONFIG
from carla_garage_tpu.models.transfuser import micro_config
from carla_garage_tpu.sensors.camera import camera_ray_grid
from carla_garage_tpu.sensors.lidar import lidar_ray_grid
from carla_garage_tpu.sim.datagen import collect_expert_frames
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch
from carla_garage_tpu.train.transfuser_train import train_transfuser

CFG = DEFAULT_CONFIG.replace(
    sensor=dataclasses.replace(DEFAULT_CONFIG.sensor,
                               lidar_resolution_width=128,
                               lidar_resolution_height=128))


def test_transfuser_training_pipeline():
  B = 2
  tcfg = dataclasses.replace(
      micro_config(), img_h=32, img_w=128, lidar_h=128, lidar_w=128,
      img_anchors=(1, 4), lidar_anchors=(4, 4))
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=B, seed=7, n_vehicles=3, n_walkers=1)
  collect = jax.jit(lambda sc, st: collect_expert_frames(
      CFG, maps, lanes, sc, st, n_frames=12))
  _, frames = collect(scene, state)

  cam_grid = camera_ray_grid(CFG, scale=8)
  lid_grid = lidar_ray_grid(CFG, half=0, decimate=32)
  model, params, hist = train_transfuser(
      CFG, tcfg, maps, scene, frames, cam_grid, lid_grid,
      steps=4, lr=2e-3, log_every=3)
  assert hist[-1]["loss"] < hist[0]["loss"]
  assert all(jnp.isfinite(v) for v in hist[-1].values())


def test_dagger_collect_expert_labels_on_policy_trajectory():
  """collect_dagger_frames: the LEARNED policy drives, the expert carry
  rides along and labels the visited states; frames keep the Frames
  contract (same pytree as collect_expert_frames)."""
  from carla_garage_tpu.agents.sensor_agent import (make_transfuser_policy,
                                                    sensor_agent_reset)
  from carla_garage_tpu.models.transfuser import LidarCenterNet
  from carla_garage_tpu.sensors.lidar import full_lidar_grid
  from carla_garage_tpu.sim.datagen import (collect_dagger_frames,
                                            collect_expert_frames)
  B = 2
  tcfg = dataclasses.replace(
      micro_config(), img_h=32, img_w=128, lidar_h=128, lidar_w=128,
      img_anchors=(1, 4), lidar_anchors=(4, 4))
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=B, seed=11, n_vehicles=3, n_walkers=1)
  cam_grid = camera_ray_grid(CFG, scale=8)
  lid_f = lidar_ray_grid(CFG, half=0, decimate=32)
  lid_r = lidar_ray_grid(CFG, half=1, decimate=32)
  model = LidarCenterNet(tcfg)
  rgb0 = jnp.zeros((B, tcfg.img_h, tcfg.img_w, 3))
  lid0 = jnp.zeros((B, tcfg.lidar_h, tcfg.lidar_w, tcfg.lidar_channels))
  params = model.init(jax.random.key(0), rgb0, lid0, jnp.zeros((B, 2)),
                      jnp.zeros((B, 6)), jnp.zeros((B,)))
  policy = make_transfuser_policy(model, None, tcfg, cam_grid, lid_f, lid_r,
                                  direct=True)
  st = state.replace(agent=sensor_agent_reset(
      CFG, B, lid_f.shape[0] * lid_f.shape[1]))
  collect = jax.jit(lambda sc, s2, p: collect_dagger_frames(
      CFG, maps, lanes, sc, s2, policy, p, n_frames=4))
  final, frames = collect(scene, st, params)
  # same pytree structure as the expert collector's output
  _, ref_frames = jax.jit(lambda sc, s2: collect_expert_frames(
      CFG, maps, lanes, sc, s2, n_frames=4))(scene, state)
  assert jax.tree.structure(frames) == jax.tree.structure(ref_frames)
  assert frames.ego_pos.shape == (4, B, 2)
  # the expert carry advanced along the policy trajectory: hazard flags
  # and steer labels are finite and the collector recorded live frames
  assert bool(jnp.all(jnp.isfinite(frames.steer)))
  assert bool(jnp.any(frames.alive))
  # the policy (random init) actually drove: trajectory differs from the
  # expert's beyond numerical noise (only ~1 s from standstill, so small)
  assert float(jnp.max(jnp.abs(frames.ego_pos - ref_frames.ego_pos))) > 1e-3
