"""TransFuser sensor agent smoke test: full sensor pipeline + model in the
jitted env step (BASELINE config 3 plumbing)."""

import dataclasses

import jax
import jax.numpy as jnp

from carla_garage_tpu.agents.sensor_agent import (make_transfuser_policy,
                                                  sensor_agent_reset)
from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.models.transfuser import LidarCenterNet, micro_config
from carla_garage_tpu.sensors.camera import camera_ray_grid
from carla_garage_tpu.sensors.lidar import lidar_ray_grid
from carla_garage_tpu.sim.episode import rollout
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch


def test_transfuser_drives_in_loop():
  B = 2
  cam_grid = camera_ray_grid(CFG, scale=8)          # 32 x 128
  lid_f = lidar_ray_grid(CFG, half=0, decimate=16)
  lid_r = lidar_ray_grid(CFG, half=1, decimate=16)
  tcfg = dataclasses.replace(
      micro_config(), img_h=32, img_w=128, lidar_h=256, lidar_w=256,
      img_anchors=(1, 4), lidar_anchors=(8, 8))
  model = LidarCenterNet(tcfg)
  rgb = jnp.zeros((B, 32, 128, 3))
  lidar = jnp.zeros((B, 256, 256, 2))
  params = model.init(jax.random.key(0), rgb, lidar, jnp.zeros((B, 2)),
                      jnp.zeros((B, 6)), jnp.zeros((B,)))

  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=B, seed=6, n_vehicles=2, n_walkers=1)
  n_lidar = lid_f.shape[0] * lid_f.shape[1]
  state = state.replace(agent=sensor_agent_reset(CFG, B, n_lidar))
  policy = make_transfuser_policy(model, params, tcfg, cam_grid,
                                  lid_f, lid_r, direct=True)
  run = jax.jit(lambda sc, st: rollout(CFG, maps, lanes, sc, st, 10,
                                       policy=policy))
  out = run(scene, state)
  assert bool(jnp.all(out.tick >= 10) | jnp.any(out.done))
  # UKF should have locked on to the true pose within ~1 m
  err = jnp.linalg.norm(out.agent.ukf.x[:, :2] - out.ego.pos, axis=-1)
  assert float(jnp.max(err)) < 2.0
