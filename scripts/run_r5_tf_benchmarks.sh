#!/bin/bash
# Honest Longest6 + LAV for the r5-retrained TransFuser++, x3 seeds,
# merged — the round-5 headline rows (VERDICT r4 tasks 1b + 7).
#
# Seeds run as separate reps=1 invocations (the 3-rep single-program
# variant faults the chip — docs/DEVICE_FAULT.md #3); each invocation
# resumes per-route via the endpoint JSON, so supervise.sh can relaunch
# through transport wedges without losing completed episodes.
set -u
CKPT="${1:-checkpoints/transfuser_r5}"
for seed in 0 1 2; do
  bash scripts/supervise.sh /tmp/tf_bench_s${seed}.log 2100 8 \
    python scripts/run_benchmarks.py --honest --reps 1 --seed ${seed} \
      --agent transfuser --checkpoint "$CKPT" \
      --benchmarks longest6 lav --suffix _r5_honest_seed${seed} \
    || echo "seed ${seed} FAILED" >> /tmp/tf_bench_fail
done
python scripts/merge_seed_runs.py \
    results/longest6_transfuser_r5_honest_seed{0,1,2}.json \
    --out results/longest6_transfuser_r5_honest.json
python scripts/merge_seed_runs.py \
    results/lav_transfuser_r5_honest_seed{0,1,2}.json \
    --out results/lav_transfuser_r5_honest.json
echo "=== merged headline rows ==="
python - <<'EOF'
import json
for b in ("longest6", "lav"):
    g = json.load(open(f"results/{b}_transfuser_r5_honest.json"))[
        "_checkpoint"]["global_record"]
    keep = ("driving_score", "driving_score_std", "route_completion",
            "infraction_score", "collisions_vehicle_per_km",
            "collisions_pedestrian_per_km", "collisions_layout_per_km",
            "red_light_per_km")
    print(b, {k: round(g[k], 3) for k in keep if k in g})
EOF
