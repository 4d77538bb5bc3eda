"""End-to-end PlanT product loop: datagen -> IL training -> closed-loop eval.

The TPU-native replacement for the reference's three-stage pipeline
(generate_dataset_slurm.py -> train.py -> evaluate_routes_slurm.py):
everything below runs in one process on one chip.

Usage: python scripts/train_plant.py [--steps 3000] [--episodes 32]
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

from carla_garage_tpu.agents.plant_agent import (make_plant_policy,
                                                 plant_agent_reset)
from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.models.plant import PlanT, PlanTConfig
from carla_garage_tpu.sim.datagen import collect_expert_frames
from carla_garage_tpu.sim.episode import rollout_chunked
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch
from carla_garage_tpu.sim.scoring import compute_scores
from carla_garage_tpu.train.plant_train import build_plant_dataset, train_plant
from carla_garage_tpu.utils.checkpoint import save_checkpoint


def plant_config() -> PlanTConfig:
  return PlanTConfig(hidden=256, n_layers=4, n_heads=8, intermediate=1024,
                     max_objects=24, num_route_points=20)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=3000)
  ap.add_argument("--episodes", type=int, default=32)
  ap.add_argument("--frames", type=int, default=400)
  ap.add_argument("--batch", type=int, default=256)
  ap.add_argument("--eval-routes", type=int, default=16)
  ap.add_argument("--out", default="checkpoints/plant")
  args = ap.parse_args()

  pcfg = plant_config()

  # ---- datagen: batched expert rollouts ----
  t0 = time.time()
  datasets = []
  for seed in range(2):
    town, maps, lanes, scene, state = make_synthetic_batch(
        CFG, batch=args.episodes, seed=seed, n_vehicles=8, n_walkers=2)
    collect = jax.jit(lambda sc, st: collect_expert_frames(
        CFG, maps, lanes, sc, st, n_frames=args.frames))
    _, frames = collect(scene, state)
    datasets.append(build_plant_dataset(CFG, pcfg, frames, scene))
  import numpy as _np
  ds = datasets[0]
  for extra in datasets[1:]:
    for f in ds.__dataclass_fields__:
      setattr(ds, f, _np.concatenate([getattr(ds, f), getattr(extra, f)]))
  print(f"datagen: {len(ds)} samples in {time.time()-t0:.0f}s", flush=True)

  # ---- training ----
  t0 = time.time()
  model, params, hist = train_plant(CFG, pcfg, ds, steps=args.steps,
                                    batch_size=args.batch, lr=3e-4,
                                    log_every=max(args.steps // 20, 1),
                                    estimate_weights=False)
  print("loss:", [round(h["loss"], 3) for h in hist], flush=True)
  print(f"training: {args.steps} steps in {time.time()-t0:.0f}s", flush=True)
  save_checkpoint(args.out, params,
                  meta={"model": "plant",
                        "config": dataclasses.asdict(pcfg)})

  # ---- closed-loop eval: expert vs PlanT on held-out routes ----
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=args.eval_routes, seed=123, n_vehicles=8, n_walkers=2)
  route_lens = jnp.asarray([
      float(np.asarray(scene.route.seg_len)[i][
          :int(scene.route.num_valid[i])].sum())
      for i in range(args.eval_routes)])

  final_e = rollout_chunked(CFG, maps, lanes, scene, state, 6000, chunk=512)
  ds_e = compute_scores(CFG, final_e.criteria, route_lens)

  out = {
      "expert_DS": float(jnp.mean(ds_e.score_composed)),
      "expert_RC": float(jnp.mean(ds_e.score_route)),
      "samples": len(ds), "steps": args.steps,
  }
  for name, direct, thr in (("wp", False, 0.5), ("direct", True, 0.5),
                            ("direct033", True, 0.33)):
    policy = make_plant_policy(model, params, pcfg, direct=direct,
                               brake_threshold=thr)
    state_p = state.replace(agent=plant_agent_reset(CFG, args.eval_routes))
    final_p = rollout_chunked(CFG, maps, lanes, scene, state_p, 6000,
                              chunk=512, policy=policy)
    ds_p = compute_scores(CFG, final_p.criteria, route_lens)
    out[f"plant_{name}_DS"] = float(jnp.mean(ds_p.score_composed))
    out[f"plant_{name}_RC"] = float(jnp.mean(ds_p.score_route))
    out[f"plant_{name}_IS"] = float(jnp.mean(ds_p.score_penalty))
  print(json.dumps(out, indent=1), flush=True)
  with open("results/plant_synth_eval.json", "w") as f:
    json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
