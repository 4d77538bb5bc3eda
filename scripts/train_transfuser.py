"""End-to-end sensor-fusion product loop (BASELINE config 3):
expert datagen -> TransFuser++ IL training with on-device rendered
sensors/labels -> closed-loop sensor-agent evaluation.

Usage: python scripts/train_transfuser.py [--steps 1500] [--episodes 16]
"""

from __future__ import annotations

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")



import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.agents.sensor_agent import (make_transfuser_policy,
                                                  sensor_agent_reset)
from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.models.transfuser import TransfuserConfig
from carla_garage_tpu.sensors.camera import camera_ray_grid
from carla_garage_tpu.sensors.lidar import lidar_ray_grid
from carla_garage_tpu.sim.datagen import collect_expert_frames
from carla_garage_tpu.sim.episode import rollout_chunked
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch
from carla_garage_tpu.sim.scoring import compute_scores
from carla_garage_tpu.train.transfuser_train import train_transfuser
from carla_garage_tpu.utils.checkpoint import save_checkpoint

CAM_SCALE = 4          # 256x64 camera for this run
LID_DECIMATE = 4


def model_config() -> TransfuserConfig:
  return TransfuserConfig(
      image_arch="regnety_micro", lidar_arch="regnety_micro",
      img_h=256 // CAM_SCALE, img_w=1024 // CAM_SCALE,
      lidar_h=256, lidar_w=256,
      img_anchors=(2, 8), lidar_anchors=(8, 8),
      n_embd=128, d_model=128, n_decoder_layers=3)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=1500)
  ap.add_argument("--episodes", type=int, default=12)
  ap.add_argument("--frames", type=int, default=300)
  ap.add_argument("--eval-routes", type=int, default=8)
  ap.add_argument("--out", default="checkpoints/transfuser")
  args = ap.parse_args()

  tcfg = model_config()
  cam_grid = camera_ray_grid(CFG, scale=CAM_SCALE)
  lid_grid = lidar_ray_grid(CFG, half=0, decimate=LID_DECIMATE)
  lid_rear = lidar_ray_grid(CFG, half=1, decimate=LID_DECIMATE)

  t0 = time.time()
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=args.episodes, seed=0, n_vehicles=8, n_walkers=2)
  collect = jax.jit(lambda sc, st: collect_expert_frames(
      CFG, maps, lanes, sc, st, n_frames=args.frames))
  _, frames = collect(scene, state)
  print(f"datagen: {args.episodes}x{args.frames} frames "
        f"in {time.time()-t0:.0f}s", flush=True)

  t0 = time.time()
  model, params, hist = train_transfuser(
      CFG, tcfg, maps, scene, frames, cam_grid, lid_grid,
      steps=args.steps, lr=3e-4, log_every=max(args.steps // 15, 1))
  print("loss:", [round(h["loss"], 3) for h in hist], flush=True)
  print(f"training: {args.steps} steps in {time.time()-t0:.0f}s", flush=True)
  save_checkpoint(args.out, params,
                  meta={"model": "transfuser",
                        "config": dataclasses.asdict(tcfg)})

  # ---- closed-loop sensor-agent eval ----
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=args.eval_routes, seed=321, n_vehicles=6, n_walkers=2)
  route_lens = jnp.asarray([
      float(np.asarray(scene.route.seg_len)[i][
          :int(scene.route.num_valid[i])].sum())
      for i in range(args.eval_routes)])
  final_e = rollout_chunked(CFG, maps, lanes, scene, state, 6000, chunk=512)
  ds_e = compute_scores(CFG, final_e.criteria, route_lens)

  n_lidar = lid_grid.shape[0] * lid_grid.shape[1]
  policy = make_transfuser_policy(model, params, tcfg, cam_grid,
                                  lid_grid, lid_rear, direct=True)
  state_t = state.replace(agent=sensor_agent_reset(
      CFG, args.eval_routes, n_lidar))
  final_t = rollout_chunked(CFG, maps, lanes, scene, state_t, 6000,
                            chunk=512, policy=policy)
  ds_t = compute_scores(CFG, final_t.criteria, route_lens)

  out = {
      "expert_DS": float(jnp.mean(ds_e.score_composed)),
      "transfuser_DS": float(jnp.mean(ds_t.score_composed)),
      "transfuser_RC": float(jnp.mean(ds_t.score_route)),
      "transfuser_IS": float(jnp.mean(ds_t.score_penalty)),
      "steps": args.steps,
      "frames": args.episodes * args.frames,
  }
  print(json.dumps(out, indent=1), flush=True)
  os.makedirs("results", exist_ok=True)
  with open("results/transfuser_synth_eval.json", "w") as f:
    json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
