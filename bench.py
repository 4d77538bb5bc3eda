"""Benchmark: batched closed-loop env steps/sec/chip.

Replaces the reference's scale story (1 GPU + 1 CARLA server per route,
evaluate_routes_slurm.py) with on-chip batched environments.

Prints ONE JSON line for the driver (the object-level metric, BASELINE
config 1) whose payload also carries the SENSOR-ON metric (BASELINE
config 3: camera + LiDAR rendering + TransFuser forward inside the step)
so regressions on the path that matters are visible in BENCH_r{N}.json.

Run on whatever platform JAX defaults to (TPU under the driver)."""

from __future__ import annotations

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")



import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.sim.episode import rollout
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch

BATCH = 256
TICKS = 200
TARGET_STEPS_PER_SEC = 10_000.0

SENSOR_BATCH = 64
SENSOR_TICKS = 50


def measure_object_level():
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=BATCH, seed=0, n_vehicles=8, n_walkers=2)
  run = jax.jit(lambda mp, ln, sc, st: rollout(CFG, mp, ln, sc, st, TICKS))
  # compile + warmup (maps/lanes passed as args, not baked-in constants)
  s = run(maps, lanes, scene, state)
  _ = int(jnp.sum(s.tick))               # hard sync (device_get)
  t0 = time.perf_counter()
  n_rounds = 5
  for _ in range(n_rounds):
    s = run(maps, lanes, scene, s)
  _ = int(jnp.sum(s.tick))               # hard sync: forces full execution
  dt = time.perf_counter() - t0
  return BATCH * TICKS * n_rounds / dt


def measure_sensor_on():
  """Full sensor path: camera + half-sweep LiDAR + voxelize + TransFuser
  forward + control, all inside the jitted step (the product model config
  of scripts/train_transfuser.py)."""
  from carla_garage_tpu.agents.sensor_agent import (make_transfuser_policy,
                                                    sensor_agent_reset)
  from carla_garage_tpu.models.transfuser import (LidarCenterNet,
                                                  TransfuserConfig)
  from carla_garage_tpu.sensors.camera import camera_ray_grid
  from carla_garage_tpu.sensors.lidar import lidar_ray_grid

  cam_scale, lid_dec = 4, 4
  tcfg = TransfuserConfig(
      image_arch="regnety_micro", lidar_arch="regnety_micro",
      img_h=256 // cam_scale, img_w=1024 // cam_scale,
      lidar_h=256, lidar_w=256,
      img_anchors=(2, 8), lidar_anchors=(8, 8),
      n_embd=128, d_model=128, n_decoder_layers=3)
  cam_grid = camera_ray_grid(CFG, scale=cam_scale)
  lid_f = lidar_ray_grid(CFG, half=0, decimate=lid_dec)
  lid_r = lidar_ray_grid(CFG, half=1, decimate=lid_dec)
  model = LidarCenterNet(tcfg)
  B = SENSOR_BATCH
  rgb = jnp.zeros((B, tcfg.img_h, tcfg.img_w, 3))
  lidar = jnp.zeros((B, 256, 256, 2))
  params = model.init(jax.random.key(0), rgb, lidar, jnp.zeros((B, 2)),
                      jnp.zeros((B, 6)), jnp.zeros((B,)))
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=B, seed=0, n_vehicles=8, n_walkers=2)
  n_lidar = lid_f.shape[0] * lid_f.shape[1]
  state = state.replace(agent=sensor_agent_reset(CFG, B, n_lidar))
  policy = make_transfuser_policy(model, params, tcfg, cam_grid,
                                  lid_f, lid_r, direct=True, bf16=True)
  run = jax.jit(lambda mp, ln, sc, st: rollout(CFG, mp, ln, sc, st,
                                               SENSOR_TICKS, policy=policy))
  s = run(maps, lanes, scene, state)
  _ = int(jnp.sum(s.tick))
  t0 = time.perf_counter()
  n_rounds = 3
  for _ in range(n_rounds):
    s = run(maps, lanes, scene, s)
  _ = int(jnp.sum(s.tick))
  dt = time.perf_counter() - t0
  return B * SENSOR_TICKS * n_rounds / dt


def main():
  obj_rate = measure_object_level()
  try:
    sensor_rate = measure_sensor_on()
  except Exception as e:                     # never break the driver line
    sensor_rate = -1.0
  print(json.dumps({
      "metric": "batched_env_steps_per_sec_per_chip",
      "value": round(obj_rate, 1),
      "unit": "env_steps/s/chip (object-level sim, expert policy; "
              "sensor_on = camera+LiDAR+TransFuser in the step at "
              f"B={SENSOR_BATCH})",
      "vs_baseline": round(obj_rate / TARGET_STEPS_PER_SEC, 4),
      "sensor_on_steps_per_sec": round(sensor_rate, 1),
      "sensor_on_vs_baseline": round(sensor_rate / TARGET_STEPS_PER_SEC, 4),
  }))


if __name__ == "__main__":
  main()
