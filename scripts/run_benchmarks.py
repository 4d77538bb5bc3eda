"""Run the full benchmark suite (Longest6 + LAV) with the expert and write
leaderboard-format artifacts under results/.

Usage: python scripts/run_benchmarks.py [--reps 1] [--single-batch]
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

from carla_garage_tpu.eval.benchmark import (print_table, run_carla_benchmark,
                                             write_csv, write_endpoint)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--reps", type=int, default=1)
  ap.add_argument("--benchmarks", nargs="+",
                  default=["longest6", "lav"])
  ap.add_argument("--single-batch", action="store_true")
  ap.add_argument("--no-scenarios", action="store_true")
  args = ap.parse_args()

  os.makedirs("results", exist_ok=True)
  for bench in args.benchmarks:
    t0 = time.time()
    records, g = run_carla_benchmark(
        benchmark=bench, reps=args.reps,
        n_vehicles=8, n_walkers=2,
        use_scenarios=not args.no_scenarios,
        single_batch=args.single_batch)
    wall = time.time() - t0
    print_table(records)
    print(f"{bench}: {json.dumps(g)} ({wall:.0f}s)", flush=True)
    suffix = f"_r{args.reps}" + ("_sb" if args.single_batch else "")
    write_endpoint(records, g, f"results/{bench}_expert{suffix}.json")
    write_csv(records, f"results/{bench}_expert{suffix}.csv")


if __name__ == "__main__":
  main()
