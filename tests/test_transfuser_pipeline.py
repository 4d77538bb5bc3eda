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
