"""Run the full benchmark suite (Longest6 + LAV) with the expert and write
leaderboard-format artifacts under results/.

The HONEST configuration (the repo's headline row: 100 town-wide NPCs per
episode, all 7 scenario types, synthesized-but-working signals) is
reproducible as:

    python scripts/run_benchmarks.py --honest --reps 3

and the reference-density configuration (route_scenario_local.py:445-494
spawns 500 vehicles per route) as:

    python scripts/run_benchmarks.py --honest --n-vehicles 500 --capacity 500

Every results JSON carries the full invocation config under `meta` so any
row in README/PARITY can be traced to its exact command.
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

from carla_garage_tpu.eval.benchmark import (print_table, run_carla_benchmark,
                                             write_csv, write_endpoint)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--reps", type=int, default=1)
  ap.add_argument("--benchmarks", nargs="+",
                  default=["longest6", "lav"])
  ap.add_argument("--single-batch", action="store_true")
  ap.add_argument("--no-scenarios", action="store_true")
  ap.add_argument("--n-vehicles", type=int, default=None,
                  help="NPC vehicles per episode (default: 8; --honest: 100;"
                       " reference Longest6 density: 500)")
  ap.add_argument("--n-walkers", type=int, default=2)
  ap.add_argument("--capacity", type=int, default=None,
                  help="vehicle slot capacity (config.sim.max_vehicles); "
                       "raised automatically to fit --n-vehicles")
  ap.add_argument("--honest", action="store_true",
                  help="the headline configuration: 100 NPCs, scenarios on")
  ap.add_argument("--seed", type=int, default=0)
  ap.add_argument("--suffix", default=None)
  ap.add_argument("--analysis-dir", default=None)
  args = ap.parse_args()

  n_vehicles = args.n_vehicles if args.n_vehicles is not None else \
      (100 if args.honest else 8)
  capacity = args.capacity or max(32, n_vehicles)
  if args.honest and args.no_scenarios:
    ap.error("--honest requires scenarios on")

  from carla_garage_tpu.config import GlobalConfig, longest6_config
  os.makedirs("results", exist_ok=True)
  for bench in args.benchmarks:
    cfg = longest6_config() if bench == "longest6" else GlobalConfig()
    cfg = cfg.replace(sim=dataclasses.replace(cfg.sim,
                                              max_vehicles=capacity))
    t0 = time.time()
    records, g = run_carla_benchmark(
        cfg=cfg, benchmark=bench, reps=args.reps,
        n_vehicles=n_vehicles, n_walkers=args.n_walkers,
        use_scenarios=not args.no_scenarios,
        single_batch=args.single_batch, seed=args.seed,
        analysis_dir=args.analysis_dir)
    wall = time.time() - t0
    print_table(records)
    print(f"{bench}: {json.dumps(g)} ({wall:.0f}s)", flush=True)
    suffix = args.suffix if args.suffix is not None else (
        f"_r{args.reps}" + ("_honest" if args.honest else "") +
        (f"_v{n_vehicles}" if args.n_vehicles is not None else "") +
        ("_sb" if args.single_batch else ""))
    meta = {
        "benchmark": bench, "reps": args.reps,
        "n_vehicles": n_vehicles, "n_walkers": args.n_walkers,
        "capacity": capacity, "seed": args.seed,
        "scenarios": not args.no_scenarios,
        "single_batch": args.single_batch,
        "wall_s": round(wall, 1),
        "cmdline": " ".join(sys.argv),
    }
    write_endpoint(records, g, f"results/{bench}_expert{suffix}.json",
                   meta=meta)
    write_csv(records, f"results/{bench}_expert{suffix}.csv")


if __name__ == "__main__":
  main()
