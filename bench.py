"""Benchmark: batched closed-loop env steps/sec/chip.

Replaces the reference's scale story (1 GPU + 1 CARLA server per route,
evaluate_routes_slurm.py) with on-chip batched environments. Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"} where vs_baseline is
relative to the BASELINE.json target of 10k batched env steps/sec/chip.

Run on whatever platform JAX defaults to (TPU under the driver)."""

from __future__ import annotations

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")



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


def main():
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

  env_steps = BATCH * TICKS * n_rounds
  rate = env_steps / dt
  print(json.dumps({
      "metric": "batched_env_steps_per_sec_per_chip",
      "value": round(rate, 1),
      "unit": "env_steps/s/chip (object-level sim, expert policy, no pixel sensors yet)",
      "vs_baseline": round(rate / TARGET_STEPS_PER_SEC, 4),
  }))


if __name__ == "__main__":
  main()
