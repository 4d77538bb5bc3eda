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
  ap.add_argument("--agent", default="expert",
                  choices=["expert", "transfuser", "plant"],
                  help="expert = privileged autopilot; transfuser = a "
                       "trained sensor-fusion checkpoint (--checkpoint); "
                       "plant = a trained object-level PlanT checkpoint")
  ap.add_argument("--checkpoint", default=None,
                  help="orbax checkpoint dir from train_transfuser.py")
  ap.add_argument("--uncertainty-threshold", type=float, default=0.33,
                  help="brake-probability override (the reference "
                       "Longest6 op point, README.md:82-84)")
  ap.add_argument("--jpeg-quality", type=int, default=None)
  ap.add_argument("--max-ticks", type=int, default=60000)
  ap.add_argument("--towns", nargs="+", default=None,
                  help="restrict to these towns (per-town invocations are "
                       "the fault-isolation protocol for the 500-NPC "
                       "reference-density rows)")
  args = ap.parse_args()

  n_vehicles = args.n_vehicles if args.n_vehicles is not None else \
      (100 if args.honest else 8)
  capacity = args.capacity or max(32, n_vehicles)
  if args.honest and args.no_scenarios:
    ap.error("--honest requires scenarios on")

  from carla_garage_tpu.config import GlobalConfig, longest6_config
  os.makedirs("results", exist_ok=True)

  # learned-agent setup: build the sensor policy from a trained checkpoint
  policy, policy_params, agent_reset = None, None, None
  if args.agent == "plant":
    if not args.checkpoint:
      ap.error("--agent plant requires --checkpoint")
    import jax
    import numpy as _np
    from carla_garage_tpu.agents.plant_agent import (make_plant_policy,
                                                     plant_agent_reset)
    from carla_garage_tpu.models.plant import PlanT, PlanTConfig
    from carla_garage_tpu.utils.checkpoint import load_checkpoint
    _, meta0 = load_checkpoint(args.checkpoint, meta_only=True)
    pcfg = PlanTConfig(**meta0["config"]) if meta0.get("config") \
        else PlanTConfig()
    model = PlanT(pcfg)
    B0 = 2
    import jax.numpy as jnp
    tpl = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((B0, pcfg.max_objects, pcfg.num_attributes)),
        jnp.zeros((B0, pcfg.max_objects), jnp.int32),
        jnp.zeros((B0, pcfg.num_route_points, 2)),
        jnp.zeros((B0,)), jnp.zeros((B0,)), jnp.zeros((B0,), bool),
        jnp.zeros((B0,)))
    tpl = jax.tree.map(lambda s: _np.zeros(s.shape, s.dtype), tpl)
    policy_params, _ = load_checkpoint(args.checkpoint, tpl)
    policy = make_plant_policy(
        model, None, pcfg, direct=True,
        brake_threshold=args.uncertainty_threshold)
    agent_reset = lambda cfg_, B: plant_agent_reset(cfg_, B)
  if args.agent == "transfuser":
    if not args.checkpoint:
      ap.error("--agent transfuser requires --checkpoint")
    import jax
    import jax.numpy as jnp
    from carla_garage_tpu.agents.sensor_agent import (
        make_transfuser_policy, sensor_agent_reset)
    from carla_garage_tpu.models.transfuser import (LidarCenterNet,
                                                    TransfuserConfig)
    from carla_garage_tpu.sensors.camera import camera_ray_grid
    from carla_garage_tpu.sensors.lidar import lidar_ray_grid
    from carla_garage_tpu.utils.checkpoint import load_checkpoint
    base = GlobalConfig()
    # config travels with the checkpoint (meta sidecar)
    _, meta0 = load_checkpoint(args.checkpoint, meta_only=True)
    tcfg = TransfuserConfig(**meta0["config"]) if meta0.get("config") \
        else TransfuserConfig()
    cam_scale = max(base.sensor.camera_height // tcfg.img_h, 1)
    lid_dec = cam_scale
    model = LidarCenterNet(tcfg)
    B0 = 2
    tpl = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((B0, tcfg.img_h, tcfg.img_w, 3)),
        jnp.zeros((B0, tcfg.lidar_h, tcfg.lidar_w, tcfg.lidar_channels)),
        jnp.zeros((B0, 2)), jnp.zeros((B0, 6)), jnp.zeros((B0,)))
    import numpy as _np
    tpl = jax.tree.map(lambda s: _np.zeros(s.shape, s.dtype), tpl)
    policy_params, _ = load_checkpoint(args.checkpoint, tpl)
    cam_grid = camera_ray_grid(base, scale=cam_scale)
    lid_f = lidar_ray_grid(base, half=0, decimate=lid_dec)
    lid_r = lidar_ray_grid(base, half=1, decimate=lid_dec)
    n_lidar = lid_f.shape[0] * lid_f.shape[1]
    policy = make_transfuser_policy(
        model, None, tcfg, cam_grid, lid_f, lid_r, direct=True, bf16=True,
        brake_threshold=args.uncertainty_threshold,
        jpeg_quality=args.jpeg_quality)
    agent_reset = lambda cfg_, B: sensor_agent_reset(cfg_, B, n_lidar)

  for bench in args.benchmarks:
    cfg = longest6_config() if bench == "longest6" else GlobalConfig()
    cfg = cfg.replace(sim=dataclasses.replace(cfg.sim,
                                              max_vehicles=capacity))
    t0 = time.time()
    kw = {}
    if policy is not None:
      kw = dict(policy=policy, policy_params=policy_params,
                agent_reset=agent_reset)
    records, g = run_carla_benchmark(
        cfg=cfg, benchmark=bench, reps=args.reps, towns=args.towns,
        n_vehicles=n_vehicles, n_walkers=args.n_walkers,
        use_scenarios=not args.no_scenarios,
        single_batch=args.single_batch, seed=args.seed,
        analysis_dir=args.analysis_dir, max_ticks=args.max_ticks, **kw)
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
        "towns": args.towns,
        "wall_s": round(wall, 1),
        "cmdline": " ".join(sys.argv),
    }
    if args.agent != "expert":
      meta["checkpoint"] = args.checkpoint
      meta["uncertainty_threshold"] = args.uncertainty_threshold
      meta["jpeg_quality"] = args.jpeg_quality
    write_endpoint(records, g,
                   f"results/{bench}_{args.agent}{suffix}.json", meta=meta)
    write_csv(records, f"results/{bench}_{args.agent}{suffix}.csv")


if __name__ == "__main__":
  main()
