"""Bisect the deterministic v5e device faults (VERDICT r4 task 4).

Two reproducible fault shapes are on record from r4 (UNAVAILABLE "kernel
fault", device recovers ~70 s after the client dies):
  A. Longest6 Town01 EXPERT at B=18 (6 routes x 3 reps, capacity 100) —
     faults mid-rollout; B=6 and B=24 at capacity 100 pass.
  B. Town03 EXPERT at capacity 500 — faults; Town01/02 at 500 pass.
Learned-policy programs never fault. Prime suspect: the expert forecast
scan + [T,B,V] OBB hazard tests at large V x B.

Each probe runs in a SUBPROCESS (a faulting child must not take down the
orchestrator); outcomes append to results/fault_bisect.jsonl. The default
matrix reproduces the two fault shapes, then shrinks: full expert rollout
vs forecast+hazard-only loop vs OBB-only loop, over B and capacity.

Usage:
  python scripts/bisect_fault.py                 # run the default matrix
  python scripts/bisect_fault.py --probe "rollout:town=Town03,B=6,V=500"
"""

from __future__ import annotations

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

RESULTS = "results/fault_bisect.jsonl"

DEFAULT_MATRIX = [
    # reproduce shape A (Town01 B=18 cap-100) and bracket it
    "rollout:town=Town01,B=18,V=100,ticks=4096",
    "rollout:town=Town01,B=18,V=100,ticks=4096,program=forecast",
    "rollout:town=Town01,B=18,V=100,ticks=4096,program=obb",
    # reproduce shape B (Town03 cap-500) and bracket it
    "rollout:town=Town03,B=6,V=500,ticks=4096",
    "rollout:town=Town03,B=6,V=500,ticks=4096,program=forecast",
    "rollout:town=Town03,B=6,V=500,ticks=4096,program=obb",
    # controls that passed in r4
    "rollout:town=Town01,B=6,V=100,ticks=4096",
    "rollout:town=Town01,B=24,V=100,ticks=4096",
]


def parse_spec(spec: str) -> dict:
  kind, _, rest = spec.partition(":")
  kv = dict(item.split("=") for item in rest.split(",") if item)
  return dict(kind=kind, town=kv.get("town", "Town01"),
              B=int(kv.get("B", 6)), V=int(kv.get("V", 100)),
              ticks=int(kv.get("ticks", 2048)),
              program=kv.get("program", "rollout"),
              seed=int(kv.get("seed", 0)))


def run_probe(spec: str):
  """Child process: build the scene and run the probe program."""
  import jax
  import jax.numpy as jnp
  import numpy as np

  from carla_garage_tpu.config import longest6_config
  from carla_garage_tpu.sim.episode import rollout_chunked
  from carla_garage_tpu.sim.scene_builder import make_town_batch

  p = parse_spec(spec)
  cfg = longest6_config()
  cfg = cfg.replace(sim=dataclasses.replace(cfg.sim, max_vehicles=p["V"]))
  town, maps, lanes, scene, state = make_town_batch(
      cfg, p["town"], batch=p["B"], seed=p["seed"], n_vehicles=p["V"],
      n_walkers=2, use_scenarios=True, min_route_m=400.0,
      max_route_m=900.0)
  t0 = time.time()
  if p["program"] == "rollout":
    final = rollout_chunked(cfg, maps, lanes, scene, state, p["ticks"],
                            chunk=512)
    print(f"ok rollout: done={bool(np.asarray(final.done).all())} "
          f"ticks={np.asarray(final.tick).max()} "
          f"{time.time()-t0:.0f}s", flush=True)
  elif p["program"] == "forecast":
    # the expert forecast scan + hazard OBB tests alone, iterated: the
    # same per-tick subprogram the rollout runs, minus dynamics/criteria
    from carla_garage_tpu.sim.expert import expert_step

    def body(i, st):
      _, upd = expert_step(cfg, maps, scene, st, jax.random.key(0))
      return st.replace(expert=upd["expert"])

    run = jax.jit(lambda st: jax.lax.fori_loop(0, 512, body, st))
    st = state
    for _ in range(p["ticks"] // 512):
      st = run(st)
      jax.block_until_ready(st.expert.steer)
    print(f"ok forecast: {time.time()-t0:.0f}s", flush=True)
  elif p["program"] == "obb":
    # [T,B,V] pairwise OBB tests alone at the fault shape
    from carla_garage_tpu.sim import geometry as geo
    T = 80
    B, V = p["B"], p["V"]
    k1, k2 = jax.random.split(jax.random.key(1))
    ec = jax.random.normal(k1, (T, B, 1, 2)) * 30.0
    ey = jax.random.normal(k2, (T, B, 1)) * 3.0
    he = jnp.array([2.45, 1.06])
    vl = jax.random.normal(k1, (T, B, V, 2)) * 30.0
    vy = jax.random.normal(k2, (T, B, V)) * 3.0
    ve = jnp.abs(jax.random.normal(k1, (B, V, 2))) + 1.0

    def body(i, acc):
      hit = geo.obb_intersect(ec + i * 0.01, ey, he[None, None, None],
                              vl, vy, ve[None])
      return acc + jnp.sum(hit)

    run = jax.jit(lambda: jax.lax.fori_loop(0, 512, body, jnp.zeros(
        (), jnp.int32)))
    out = run()
    jax.block_until_ready(out)
    print(f"ok obb: {int(out)} hits {time.time()-t0:.0f}s", flush=True)
  else:
    raise ValueError(p["program"])


def orchestrate(matrix, timeout_s: int):
  os.makedirs("results", exist_ok=True)
  for spec in matrix:
    t0 = time.time()
    try:
      r = subprocess.run(
          [sys.executable, os.path.abspath(__file__), "--probe", spec],
          capture_output=True, text=True, timeout=timeout_s,
          cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
      outcome = ("pass" if r.returncode == 0 else "FAULT")
      tail = (r.stdout + r.stderr).strip()[-400:]
    except subprocess.TimeoutExpired as ex:
      outcome, r = "TIMEOUT", None
      tail = ((ex.stdout or b"").decode(errors="ignore") +
              (ex.stderr or b"").decode(errors="ignore")).strip()[-400:]
    rec = {"spec": spec, "outcome": outcome,
           "wall_s": round(time.time() - t0, 1), "tail": tail}
    print(json.dumps({k: rec[k] for k in ("spec", "outcome", "wall_s")}),
          flush=True)
    with open(RESULTS, "a") as f:
      f.write(json.dumps(rec) + "\n")
    if outcome != "pass":
      # the device needs ~70 s to self-recover after a faulting client
      time.sleep(75)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--probe", default=None,
                  help="run ONE probe in-process (child mode)")
  ap.add_argument("--matrix", nargs="+", default=None)
  ap.add_argument("--timeout", type=int, default=1800)
  args = ap.parse_args()
  if args.probe:
    run_probe(args.probe)
    return
  orchestrate(args.matrix or DEFAULT_MATRIX, args.timeout)


if __name__ == "__main__":
  main()
