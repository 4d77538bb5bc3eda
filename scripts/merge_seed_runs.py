"""Merge per-seed benchmark runs into one multi-seed artifact.

The benchmark protocol on this chip runs repetitions as separate
seed-indexed reps=1 invocations (the B=3*routes single-program variant
deterministically faults the v5e — see docs/DEVICE_FAULT.md), so the
reference's 3-repetition rows (evaluate_routes_slurm.py:124-312) are
assembled here: records concatenate (each tagged with its seed), the
global record is recomputed over all episodes, and per-seed aggregates +
the DS mean/std across seeds ride along.

Usage:
  python scripts/merge_seed_runs.py \
      results/longest6_plant_r5_honest_seed{0,1,2}.json \
      --out results/longest6_plant_r5_honest.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from carla_garage_tpu.eval.benchmark import aggregate


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("inputs", nargs="+")
  ap.add_argument("--out", required=True)
  args = ap.parse_args()

  records, per_seed, seeds, metas = [], [], [], []
  for path in args.inputs:
    with open(path) as f:
      d = json.load(f)
    ck = d["_checkpoint"]
    seed = d.get("meta", {}).get("seed", len(seeds))
    seeds.append(seed)
    metas.append(d.get("meta", {}))
    for r in ck["records"]:
      r = dict(r)
      r["seed"] = seed
      records.append(r)
    per_seed.append(ck["global_record"])

  g = aggregate(records)
  ds = np.array([p["driving_score"] for p in per_seed])
  g["driving_score_std"] = float(ds.std())
  g["per_seed"] = per_seed

  m0 = metas[0]
  meta = {
      "benchmark": m0.get("benchmark"),
      "reps": f"{len(seeds)} seeds x reps=1 (per-seed invocations; "
              "multi-rep single programs fault the device — "
              "docs/DEVICE_FAULT.md)",
      "n_vehicles": m0.get("n_vehicles"),
      "capacity": m0.get("capacity"),
      "scenarios": m0.get("scenarios"),
      "seeds": seeds,
      "checkpoint": m0.get("checkpoint"),
      "uncertainty_threshold": m0.get("uncertainty_threshold"),
      "cmdline": m0.get("cmdline", "").replace("--seed 0",
                                               "--seed {%s}" % ",".join(
                                                   map(str, seeds))),
      "inputs": args.inputs,
  }
  out = {
      "_checkpoint": {"records": records, "global_record": g},
      "values": [g["driving_score"], g["route_completion"],
                 g["infraction_score"]],
      "labels": ["Avg. driving score", "Avg. route completion",
                 "Avg. infraction penalty"],
      "meta": meta,
  }
  with open(args.out, "w") as f:
    json.dump(out, f)
  print(f"{args.out}: DS {g['driving_score']:.1f} ± "
        f"{g['driving_score_std']:.1f} / RC {g['route_completion']:.1f} / "
        f"IS {g['infraction_score']:.2f} over {g['num_routes']} episodes "
        f"({len(seeds)} seeds)")


if __name__ == "__main__":
  main()
