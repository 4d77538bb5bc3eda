"""DAgger A/B at MATCHED total optimizer steps — the controlled experiment
rounds 3-4 never ran (VERDICT r4 Weak #4 / task 6).

Both arms see the SAME BC dataset, the same segment sizes (so optimizer
restarts are matched), the same honest-density eval suite (100 NPCs,
scenarios, >=2 seeds x 2 towns):

  arm "bc":     segments x seg_steps, all on expert BC data.
  arm "dagger": segment 0 on BC data; before each later segment, collect
                on-policy frames with the CURRENT model (expert labels ride
                along, datagen.collect_dagger_frames) and train on the
                BC+DAgger mix (DAgger wp_weight=0 — the recorded
                trajectory is the policy's own).

Run on PlanT: the mechanism is identical to the TransFuser DAgger path but
costs minutes instead of hours, so the A/B can afford honest density and
multiple seeds. Output: one table, results/dagger_ab_plant_r5.json.

Usage:
  python scripts/dagger_ab.py --segments 3 --seg-steps 2000
"""

from __future__ import annotations

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# honor JAX_PLATFORMS=cpu even under the axon sitecustomize (which
# registers the TPU backend at interpreter start — env vars alone are too
# late, tests/conftest.py pattern). Lets the A/B run on the host CPU while
# the chip trains TransFuser.
if _os.environ.get("JAX_PLATFORMS") == "cpu":
  jax.config.update("jax_platforms", "cpu")

import numpy as np

from carla_garage_tpu.agents.plant_agent import (make_plant_policy,
                                                 plant_agent_reset)
from carla_garage_tpu.sim.datagen import collect_dagger_frames
from carla_garage_tpu.sim.scene_builder import make_town_batch
from carla_garage_tpu.train.plant_train import (build_plant_dataset,
                                                train_plant)
from train_plant import (concat_datasets, datagen_shard, honest_cfg,
                         plant_config, plant_eval_suite)


def collect_dagger_ds(cfg, pcfg, args, model, params, town_name: str,
                      seed: int):
  """On-policy frames driven by the CURRENT PlanT, expert labels along the
  visited trajectory; wp supervision off (wp_weight=0)."""
  town, maps, lanes, scene, state = make_town_batch(
      cfg, town_name, batch=args.episodes, seed=seed,
      n_vehicles=args.n_vehicles, n_walkers=2, use_scenarios=True,
      min_route_m=args.min_route_m, max_route_m=args.max_route_m)
  policy = make_plant_policy(model, None, pcfg, direct=True,
                             brake_threshold=0.33)
  st = state.replace(agent=plant_agent_reset(cfg, args.episodes))
  chunk = 20
  collect = jax.jit(lambda mp, ln, sc, s2, p: collect_dagger_frames(
      cfg, mp, ln, sc, s2, policy, p, n_frames=chunk))
  parts = []
  for _ in range(args.dagger_frames // chunk):
    st, fr = collect(maps, lanes, scene, st, params)
    parts.append(fr)
  frames = jax.tree.map(lambda *xs: np.concatenate(
      [np.asarray(x) for x in xs], 0), *parts)
  import jax.numpy as jnp
  ds = build_plant_dataset(cfg, pcfg, jax.tree.map(jnp.asarray, frames),
                           scene)
  ds.wp_weight = np.zeros((len(ds),), np.float32)
  return ds


def run_arm(name: str, cfg, pcfg, args, bc_ds, eval_seeds):
  model, params = None, None
  t0 = time.time()
  train_ds = bc_ds
  rng = np.random.default_rng(7)
  for seg in range(args.segments):
    if name == "dagger" and seg > 0:
      dag_town = args.towns[(seg * 2 + 1) % len(args.towns)]
      from carla_garage_tpu.models.plant import PlanT
      dag = collect_dagger_ds(cfg, pcfg, args, PlanT(pcfg), params,
                              dag_town, seed=9000 + 31 * seg)
      print(f"[{name}] dagger collect seg{seg} [{dag_town}]: "
            f"{len(dag)} frames", flush=True)
      train_ds = concat_datasets([bc_ds, dag] if seg == 1 else
                                 [train_ds, dag])
    model, params, hist = train_plant(
        cfg, pcfg, train_ds, steps=args.seg_steps,
        batch_size=args.batch, lr=args.lr, params=params,
        log_every=args.seg_steps, estimate_weights=(seg == 0))
    print(f"[{name}] segment {seg}: loss {hist[-1]['loss']:.3f} "
          f"({time.time()-t0:.0f}s)", flush=True)
  ev = plant_eval_suite(cfg, model, params, pcfg, args.eval_towns,
                        eval_seeds, args.eval_routes, args,
                        max_ticks=args.eval_max_ticks)
  ev["arm"] = name
  ev["total_steps"] = args.segments * args.seg_steps
  return ev


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--segments", type=int, default=3)
  ap.add_argument("--seg-steps", type=int, default=2000)
  ap.add_argument("--batch", type=int, default=512)
  ap.add_argument("--lr", type=float, default=3e-4)
  ap.add_argument("--shards", type=int, default=6)
  ap.add_argument("--episodes", type=int, default=16)
  ap.add_argument("--frames", type=int, default=400)
  ap.add_argument("--dagger-frames", type=int, default=100)
  ap.add_argument("--n-vehicles", type=int, default=100)
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
  ap.add_argument("--results", default="results/dagger_ab_plant_r5.json")
  args = ap.parse_args()

  pcfg = plant_config()
  cfg = honest_cfg(args.n_vehicles)

  parts = []
  for i in range(args.shards):
    town_name = args.towns[i % len(args.towns)]
    ds, n_clean = datagen_shard(cfg, pcfg, args, town_name,
                                seed=2000 + 61 * i)
    parts.append(ds)
    print(f"bc shard {i} [{town_name}]: {len(ds)} samples "
          f"({n_clean}/{args.episodes} clean)", flush=True)
  bc_ds = concat_datasets(parts)
  print(f"bc dataset: {len(bc_ds)} samples", flush=True)

  eval_seeds = [4321 + 11 * s for s in range(args.eval_seeds)]
  rows = [run_arm(name, cfg, pcfg, args, bc_ds, eval_seeds)
          for name in ("bc", "dagger")]
  for r in rows:
    print(f"{r['arm']:>7}: DS {r['DS']:.1f}±{r['DS_std']:.1f} "
          f"RC {r['RC']:.1f} IS {r['IS']:.2f} "
          f"coll_veh {r['coll_veh']:.2f} blocked {r['blocked']:.2f}",
          flush=True)
  delta = rows[1]["DS"] - rows[0]["DS"]
  noise = max(rows[0]["DS_std"], rows[1]["DS_std"])
  verdict = ("dagger helps" if delta > noise else
             "dagger hurts" if delta < -noise else "within noise")
  out = {"arms": rows, "delta_DS": delta, "noise_std": noise,
         "verdict": verdict,
         "meta": {"cmdline": " ".join(sys.argv),
                  "matched_total_steps": args.segments * args.seg_steps,
                  "n_vehicles": args.n_vehicles,
                  "eval_seeds": eval_seeds}}
  print(json.dumps({k: v for k, v in out.items() if k != "arms"},
                   indent=1), flush=True)
  os.makedirs(os.path.dirname(args.results) or ".", exist_ok=True)
  with open(args.results, "w") as f:
    json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
