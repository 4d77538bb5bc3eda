"""End-to-end PlanT product loop at HONEST density on the real towns:
object-level expert datagen (Town01-06, 100 town-wide NPCs, all 7 scenario
types) -> IL training -> honest-density closed-loop eval suite with
checkpoint selection off the (town x seed) mean.

The TPU-native replacement for the reference's three-stage pipeline
(generate_dataset_slurm.py -> train.py -> evaluate_routes_slurm.py):
everything below runs in one process on one chip. The r4 PlanT checkpoint
was trained on the synthetic grid town at 8 NPCs and collapsed on honest
Longest6 (DS 25.6 vs the reference's 82, additional_features.md:9-13);
this recipe matches the training distribution to the benchmark: same
towns, same density, same scenario mix.

Usage (the r5 recipe):
  python scripts/train_plant.py --shards 24 --episodes 16 --frames 400 \
      --steps 12000 --out checkpoints/plant_r5
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
from carla_garage_tpu.config import DEFAULT_CONFIG
from carla_garage_tpu.models.plant import PlanT, PlanTConfig
from carla_garage_tpu.sim.datagen import collect_expert_frames
from carla_garage_tpu.sim.episode import rollout_chunked
from carla_garage_tpu.sim.scene_builder import _PAD_CACHE, make_town_batch
from carla_garage_tpu.sim.scoring import compute_scores
from carla_garage_tpu.train.plant_train import (PlantDataset,
                                                build_plant_dataset,
                                                train_plant)
from carla_garage_tpu.utils.checkpoint import save_checkpoint


def plant_config() -> PlanTConfig:
  return PlanTConfig(hidden=256, n_layers=4, n_heads=8, intermediate=1024,
                     max_objects=24, num_route_points=20)


def honest_cfg(capacity: int):
  cfg = DEFAULT_CONFIG
  return cfg.replace(sim=dataclasses.replace(cfg.sim,
                                             max_vehicles=capacity))


def datagen_shard(cfg, pcfg, args, town_name: str, seed: int):
  """One expert shard at honest density with scenarios attached, with the
  reference's quality gate (data.py:91-95: imperfect episodes dropped —
  here via the alive mask)."""
  town, maps, lanes, scene, state = make_town_batch(
      cfg, town_name, batch=args.episodes, seed=seed,
      n_vehicles=args.n_vehicles, n_walkers=args.n_walkers,
      use_scenarios=True, min_route_m=args.min_route_m,
      max_route_m=args.max_route_m)
  chunk = 20
  assert args.frames % chunk == 0
  collect = jax.jit(lambda mp, ln, sc, st: collect_expert_frames(
      cfg, mp, ln, sc, st, n_frames=chunk))
  st, parts = state, []
  for _ in range(args.frames // chunk):
    st, fr = collect(maps, lanes, scene, st)
    parts.append(jax.tree.map(np.asarray, fr))
  frames = jax.tree.map(lambda *xs: np.concatenate(xs, 0), *parts)
  cr = st.criteria
  clean = (np.asarray(cr.n_collision_vehicle) == 0) & \
          (np.asarray(cr.n_collision_walker) == 0) & \
          (np.asarray(cr.n_collision_static) == 0) & \
          (np.asarray(cr.n_red_light) == 0) & \
          (~np.asarray(cr.blocked))
  frames = frames.replace(alive=frames.alive & clean[None, :])
  ds = build_plant_dataset(cfg, pcfg, jax.tree.map(jnp.asarray, frames),
                           scene)
  return ds, int(clean.sum())


def concat_datasets(parts):
  out = parts[0]
  for extra in parts[1:]:
    n_out, n_extra = len(out.boxes), len(extra.boxes)
    for f in out.__dataclass_fields__:
      a, b = getattr(out, f), getattr(extra, f)
      if a is None and b is None:
        continue
      if a is None:
        a = np.ones((n_out,), np.float32)
      if b is None:
        b = np.ones((n_extra,), np.float32)
      setattr(out, f, np.concatenate([a, b]))
  return out


def plant_eval_suite(cfg, model, params, pcfg, towns, seeds, n_routes,
                     args, max_ticks: int = 10000):
  """Honest-density closed-loop eval: (town x seed) batches at the
  benchmark operating point (100 NPCs, scenarios on, creep recovery,
  DIRECT @ threshold 0.33). Checkpoint selection keys off the MEAN —
  the r4 collapse (suite DS 25.7 at 8 NPCs -> honest benchmark 1.8)
  is structurally impossible when the suite IS the honest config."""
  policy = make_plant_policy(model, None, pcfg, direct=True,
                             brake_threshold=0.33)
  rows = []
  for t in towns:
    for s in seeds:
      town, maps, lanes, scene, state = make_town_batch(
          cfg, t, batch=n_routes, seed=s, n_vehicles=args.n_vehicles,
          n_walkers=args.n_walkers, use_scenarios=True,
          min_route_m=300.0, max_route_m=600.0)
      route_lens = jnp.asarray([
          float(np.asarray(scene.route.seg_len)[i][
              :int(np.asarray(scene.route.num_valid)[i])].sum())
          for i in range(n_routes)])
      st = state.replace(agent=plant_agent_reset(cfg, n_routes))
      final = rollout_chunked(cfg, maps, lanes, scene, st, max_ticks,
                              chunk=512, policy=policy,
                              policy_params=params)
      sc = compute_scores(cfg, final.criteria, route_lens)
      cr = final.criteria
      m = lambda x: float(np.asarray(x, np.float32).mean())
      rows.append(dict(
          town=t, seed=s,
          DS=float(jnp.mean(sc.score_composed)),
          RC=float(jnp.mean(sc.score_route)),
          IS=float(jnp.mean(sc.score_penalty)),
          coll_veh=m(cr.n_collision_vehicle),
          coll_wlk=m(cr.n_collision_walker),
          red_light=m(cr.n_red_light),
          blocked=m(cr.blocked)))
  ds = np.array([r["DS"] for r in rows])
  agg = {k: float(np.mean([r[k] for r in rows]))
         for k in rows[0] if isinstance(rows[0][k], float)}
  agg.update(DS=float(ds.mean()), DS_std=float(ds.std()), rows=rows)
  return agg


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=12000,
                  help="total optimizer steps, split over --segments")
  ap.add_argument("--segments", type=int, default=3,
                  help="train/eval alternations; checkpoint selection "
                       "takes the best eval-suite mean")
  ap.add_argument("--shards", type=int, default=24)
  ap.add_argument("--episodes", type=int, default=16)
  ap.add_argument("--frames", type=int, default=400)
  ap.add_argument("--batch", type=int, default=512)
  ap.add_argument("--n-vehicles", type=int, default=100,
                  help="honest benchmark density (run_benchmarks --honest)")
  ap.add_argument("--n-walkers", type=int, default=2)
  ap.add_argument("--towns", nargs="+",
                  default=["Town01", "Town02", "Town03", "Town04",
                           "Town05", "Town06"])
  ap.add_argument("--eval-towns", nargs="+", default=["Town02", "Town05"])
  ap.add_argument("--eval-seeds", type=int, default=2)
  ap.add_argument("--eval-routes", type=int, default=8)
  ap.add_argument("--eval-max-ticks", type=int, default=10000)
  ap.add_argument("--min-route-m", type=float, default=300.0)
  ap.add_argument("--max-route-m", type=float, default=500.0)
  ap.add_argument("--lr", type=float, default=3e-4)
  ap.add_argument("--out", default="checkpoints/plant_r5")
  ap.add_argument("--results", default="results/plant_r5_train.json")
  args = ap.parse_args()

  pcfg = plant_config()
  cfg = honest_cfg(args.n_vehicles)

  # ---- datagen: honest-density expert rollouts, grouped by town so at
  # most one town's raster stack is devcache-resident at a time ----
  t0 = time.time()
  parts, clean_total = [], 0
  per_town = max(args.shards // len(args.towns), 1)
  for town_name in args.towns:
    for k in range(per_town):
      seed = 1000 * args.towns.index(town_name) + 37 * k + 5
      ds, n_clean = datagen_shard(cfg, pcfg, args, town_name, seed)
      clean_total += n_clean
      parts.append(ds)
      print(f"shard {town_name}/{k}: {len(ds)} samples "
            f"({n_clean}/{args.episodes} clean episodes, "
            f"{time.time()-t0:.0f}s)", flush=True)
    # drop this town's device-resident rasters before the next town
    for key in [k for k in _PAD_CACHE
                if isinstance(k, tuple) and town_name in k]:
      del _PAD_CACHE[key]
  ds = concat_datasets(parts)
  print(f"datagen: {len(ds)} samples, "
        f"{clean_total}/{args.shards * args.episodes} clean episodes, "
        f"{time.time()-t0:.0f}s", flush=True)

  # ---- training segments with honest eval-suite checkpoint selection ----
  seg_steps = args.steps // args.segments
  params = None
  best = {"DS": -1.0}
  best_params = None
  evals = []
  model = PlanT(pcfg)
  for seg in range(args.segments):
    t1 = time.time()
    model, params, hist = train_plant(
        cfg, pcfg, ds, steps=seg_steps, batch_size=args.batch, lr=args.lr,
        params=params, log_every=max(seg_steps // 8, 1),
        estimate_weights=(seg == 0))
    print(f"segment {seg}: {seg_steps} steps in {time.time()-t1:.0f}s, "
          f"loss {hist[-1]['loss']:.3f}", flush=True)
    ev = plant_eval_suite(cfg, model, params, pcfg, args.eval_towns,
                          [4321 + 11 * s for s in range(args.eval_seeds)],
                          args.eval_routes, args,
                          max_ticks=args.eval_max_ticks)
    ev["segment"], ev["step"] = seg, (seg + 1) * seg_steps
    evals.append(ev)
    print(f"eval @seg{seg}: DS {ev['DS']:.1f}±{ev['DS_std']:.1f} "
          f"RC {ev['RC']:.1f} coll_veh {ev['coll_veh']:.2f}", flush=True)
    if ev["DS"] >= best["DS"]:
      best = ev
      best_params = jax.tree.map(np.asarray, params)

  save_checkpoint(args.out, best_params,
                  meta={"model": "plant", "config": dataclasses.asdict(pcfg),
                        "best_eval": best, "samples": len(ds),
                        "recipe": " ".join(sys.argv)})
  out = {"samples": len(ds), "steps": args.steps, "best_eval": best,
         "evals": evals,
         "meta": {"cmdline": " ".join(sys.argv),
                  "n_vehicles": args.n_vehicles,
                  "towns": args.towns, "eval_towns": args.eval_towns,
                  "config": dataclasses.asdict(pcfg)}}
  print(json.dumps({k: v for k, v in out.items() if k != "evals"},
                   indent=1), flush=True)
  os.makedirs(os.path.dirname(args.results) or ".", exist_ok=True)
  with open(args.results, "w") as f:
    json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
