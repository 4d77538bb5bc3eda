"""Batched benchmark evaluation — the leaderboard evaluator + SLURM farm
replaced by on-chip batches.

The reference evaluates Longest6 as 36 routes x 3 seeds = 108 SLURM GPU
jobs, each with its own CARLA server (evaluate_routes_slurm.py:124-312).
Here every route x repetition is one batch element; a town's whole route
set runs as a single jitted chunked rollout. Records follow the
StatisticsManager JSON layout (statistics_manager_local.py:33-57,
:243-320) and the CSV summary mirrors tools/result_parser.py.
"""

from __future__ import annotations

import csv
import json
import time
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.config import GlobalConfig, longest6_config
from carla_garage_tpu.maps import importer
from carla_garage_tpu.sim.episode import rollout_chunked
from carla_garage_tpu.sim.expert import expert_step
from carla_garage_tpu.sim.scene_builder import (build_batch, compile_route,
                                                make_synthetic_batch)
from carla_garage_tpu.sim.scoring import compute_scores

INFRACTION_KEYS = ("collisions_pedestrian", "collisions_vehicle",
                   "collisions_layout", "red_light", "stop_infraction")


def _route_lens(scene):
  seg = np.asarray(scene.route.seg_len)
  nv = np.asarray(scene.route.num_valid)
  return np.array([seg[i, :nv[i]].sum() for i in range(len(nv))])


def _records(cfg, scene, state, route_ids, town):
  cr = state.criteria
  lens = _route_lens(scene)
  scores = compute_scores(cfg, cr, jnp.asarray(lens))
  recs = []
  counts = {
      "collisions_pedestrian": np.asarray(cr.n_collision_walker),
      "collisions_vehicle": np.asarray(cr.n_collision_vehicle),
      "collisions_layout": np.asarray(cr.n_collision_static),
      "red_light": np.asarray(cr.n_red_light),
      "stop_infraction": np.asarray(cr.n_stop_sign),
  }
  for i, rid in enumerate(route_ids):
    if rid is None:                      # mesh-padding episode
      continue
    status = "Completed" if bool(scores.completed[i]) else "Failed"
    if bool(cr.blocked[i]):
      status += " - Agent got blocked"
    elif bool(cr.timed_out[i]):
      status += " - Agent timed out"
    elif bool(cr.deviated[i]):
      status += " - Agent deviated from the route"
    from carla_garage_tpu.eval.analysis import events_from_criteria
    recs.append({
        "route_id": rid,
        "town": town,
        "index": i,
        "status": status,
        "infractions": {k: int(counts[k][i]) for k in INFRACTION_KEYS},
        "events": events_from_criteria(cr, i),
        "scores": {
            "score_route": float(scores.score_route[i]),
            "score_penalty": float(scores.score_penalty[i]),
            "score_composed": float(scores.score_composed[i]),
        },
        "meta": {"route_length": float(lens[i]),
                 "duration_game": float(np.asarray(state.tick)[i]) / 20.0},
    })
  return recs


def aggregate(records):
  """compute_global_statistics analog (statistics_manager:210-241)."""
  n = max(len(records), 1)
  out = {
      "driving_score": sum(r["scores"]["score_composed"]
                           for r in records) / n,
      "route_completion": sum(r["scores"]["score_route"]
                              for r in records) / n,
      "infraction_score": sum(r["scores"]["score_penalty"]
                              for r in records) / n,
      "num_routes": len(records),
  }
  for k in INFRACTION_KEYS:
    km = sum(max(r["scores"]["score_route"] / 100.0 *
                 r["meta"]["route_length"] / 1000.0, 1e-3)
             for r in records)
    out[f"{k}_per_km"] = sum(r["infractions"][k] for r in records) / km
  return out


def run_synthetic_benchmark(cfg: GlobalConfig = None, n_routes: int = 8,
                            reps: int = 1, seed: int = 0,
                            n_vehicles: int = 8, n_walkers: int = 2,
                            max_ticks: int = 6000, policy=expert_step):
  """Self-contained benchmark on the procedural town."""
  cfg = cfg or longest6_config()
  records = []
  for rep in range(reps):
    town, maps, lanes, scene, state = make_synthetic_batch(
        cfg, batch=n_routes, seed=seed + 1000 * rep,
        n_vehicles=n_vehicles, n_walkers=n_walkers)
    final = rollout_chunked(cfg, maps, lanes, scene, state, max_ticks,
                            chunk=512, policy=policy)
    records += _records(cfg, scene, final,
                        [f"synth_{i}_rep{rep}" for i in range(n_routes)],
                        "SynthTown")
  return records, aggregate(records)


def _scenario_setup(cfg, scen_ann, episodes, town, seed: int):
  """All 7 scenario types per episode: annotation-driven (1/3/4) +
  geometry-synthesized (2/5/6/7-10) — sim/scenario_wiring.py."""
  from carla_garage_tpu.sim.scenario_wiring import build_benchmark_scenarios
  return build_benchmark_scenarios(cfg, town, episodes, scen_ann, seed)


def _pad_for_mesh(mesh, eps, ids, extras=()):
  """Pad the episode list to a multiple of the dp mesh size by repeating
  the last episode; padded ids become None so their records are dropped.
  Returns (eps, ids, extras) with every list padded in lockstep."""
  n = mesh.shape["dp"]
  pad = (-len(eps)) % n
  if pad:
    eps = list(eps) + [eps[-1]] * pad
    ids = list(ids) + [None] * pad
    extras = tuple(list(e) + [e[-1]] * pad for e in extras)
  return eps, ids, extras


def _shard_episode_batch(mesh, maps, lanes, scene, state):
  """Episode batch over the dp axis, town rasters replicated — the
  job-farm axis of evaluate_routes_slurm.py:124-312 as a mesh axis."""
  from carla_garage_tpu.parallel.mesh import replicate, shard_leading
  B = int(scene.route.num_valid.shape[0])
  return (replicate(mesh, maps), replicate(mesh, lanes),
          shard_leading(mesh, scene, B), shard_leading(mesh, state, B))


def run_carla_benchmark(cfg: GlobalConfig = None, benchmark: str = "longest6",
                        reps: int = 1, towns: list | None = None,
                        n_vehicles: int = 8, n_walkers: int = 2,
                        max_ticks: int = 60000, seed: int = 0,
                        policy=expert_step, assets_root=None,
                        use_scenarios: bool = True,
                        single_batch: bool = False,
                        verbose: bool = True,
                        analysis_dir: str | None = None,
                        mesh=None, policy_params=None, agent_reset=None):
  """Run a real benchmark's routes inside the TPU sim.

  use_scenarios attaches all 7 scenario types (annotations +
  geometry-synthesized triggers, sim/scenario_wiring.py).

  single_batch=True runs ALL towns' routes as ONE mixed-town batch — one
  compile, one lax.scan for the whole benchmark (the maximal contrast to
  the reference's 108 SLURM jobs). Needs HBM for the stacked rasters:
  with the OBJECT-LEVEL policies this is the fastest mode; with the
  full-spec SENSOR policy the 6 stacked full-town rasters (~1.3 GB) plus
  B=36 render workspaces faulted the v5e device (measured r4) — use the
  default per-town mode for sensor agents (each town's program is
  compiled once and cached; Longest6 full-spec runs at ~3-6 min/town).

  analysis_dir records decimated trajectories and writes the result
  parser's artifacts there: per-town infraction maps + replay clips
  (tools/result_parser.py:881-975 analog, eval/analysis.py).

  mesh: a jax.sharding.Mesh with a "dp" axis. The episode batch is
  sharded over it (padded to a multiple of the mesh size); town rasters
  replicate. One benchmark then spans every chip the way the reference
  spans SLURM jobs.

  policy_params + agent_reset evaluate LEARNED policies on the real
  benchmark routes: policy_params is the weight pytree forwarded through
  the jit boundary, agent_reset(cfg, B) -> agent-state pytree installed
  as state.agent before rollout (e.g. sensor_agent_reset for a
  make_transfuser_policy / TransFuser++ checkpoint)."""
  cfg = cfg or (longest6_config() if benchmark == "longest6"
                else GlobalConfig())
  root = assets_root or importer.DEFAULT_ASSETS
  routes = importer.load_benchmark_routes(benchmark, root)
  by_town = defaultdict(list)
  for r in routes:
    if towns is None or r.town in towns:
      by_town[r.town].append(r)

  if single_batch:
    return _run_single_batch(cfg, by_town, root, reps, n_vehicles,
                             n_walkers, max_ticks, seed, policy,
                             use_scenarios, verbose, mesh=mesh,
                             policy_params=policy_params,
                             agent_reset=agent_reset)

  records = []
  for town_name, town_routes in sorted(by_town.items()):
    t0 = time.time()
    imported = importer.load_town(town_name, root, rng_seed=seed)
    eps, ids, polys = [], [], []
    # compile once, reuse across reps
    compiled = []
    town_adapter = importer.as_synthetic_town(imported, [
        r.keypoints_xy for r in town_routes])
    for r in town_routes:
      ep = compile_route(town_adapter, r.keypoints_xy, r.keypoints_yaw)
      compiled.append(ep)
      polys.append(ep.dense)
    town_adapter = importer.as_synthetic_town(imported, polys)
    for rep in range(reps):
      for r, ep in zip(town_routes, compiled):
        eps.append(ep)
        ids.append(f"{r.route_id}_rep{rep}")
    if mesh is not None:
      eps, ids, _ = _pad_for_mesh(mesh, eps, ids)
    walker_sites = None
    scenario_npcs = None
    if use_scenarios:
      scen_ann = importer.load_scenarios(town_name, root)
      walker_sites, specs, scen_state, scenario_npcs = _scenario_setup(
          cfg, scen_ann, eps, town_adapter, seed)
    maps, lanes, scene, state = build_batch(
        cfg, town_adapter, eps, seed=seed, n_vehicles=n_vehicles,
        n_walkers=n_walkers, walker_sites=walker_sites,
        scenario_npcs=scenario_npcs)
    if use_scenarios:
      scene = scene.replace(scenarios=specs)
      state = state.replace(scenario=scen_state)
    if agent_reset is not None:
      state = state.replace(agent=agent_reset(cfg, len(eps)))
    if mesh is not None:
      maps, lanes, scene, state = _shard_episode_batch(
          mesh, maps, lanes, scene, state)
    if analysis_dir:
      final, traj = _rollout_chunked_recorded(
          cfg, maps, lanes, scene, state, max_ticks, policy=policy,
          policy_params=policy_params)
    else:
      final = rollout_chunked(cfg, maps, lanes, scene, state, max_ticks,
                              chunk=1024, policy=policy,
                              policy_params=policy_params)
    recs = _records(cfg, scene, final, ids, town_name)
    records += recs
    if analysis_dir:
      from carla_garage_tpu.eval.analysis import write_analysis
      tw = town_adapter
      write_analysis(
          analysis_dir,
          {town_name: (np.asarray(tw.raster), np.asarray(tw.world_offset),
                       float(tw.ppm))},
          {town_name: [(r["index"], r["events"]) for r in recs]},
          {town_name: [ep.dense for ep in compiled]},
          {town_name: traj})
    if verbose:
      ds = np.mean([x["scores"]["score_composed"] for x in recs])
      print(f"{town_name}: {len(recs)} episodes, DS {ds:.1f}, "
            f"{time.time() - t0:.0f}s", flush=True)
  return records, aggregate(records)


def _rollout_chunked_recorded(cfg, maps, lanes, scene, state, max_ticks,
                              chunk: int = 1000, every: int = 10,
                              policy=expert_step, policy_params=None):
  """Chunked rollout that also concatenates decimated trajectory logs
  (host side), with the same early exit as rollout_chunked."""
  import jax
  from carla_garage_tpu.sim.episode import rollout_recorded

  @jax.jit
  def run(maps_, lanes_, scene_, state_, params_):
    return rollout_recorded(cfg, maps_, lanes_, scene_, state_, chunk,
                            every=every, policy=policy,
                            policy_params=params_)

  chunks = []
  ticks = 0
  while ticks < max_ticks:
    state, traj = run(maps, lanes, scene, state, policy_params)
    chunks.append(jax.tree.map(np.asarray, traj))
    ticks += chunk
    if bool(np.asarray(state.done).all()):
      break
  traj = jax.tree.map(lambda *xs: np.concatenate(xs, 0), *chunks)
  return state, traj


def _run_single_batch(cfg, by_town, root, reps, n_vehicles, n_walkers,
                      max_ticks, seed, policy, use_scenarios, verbose,
                      mesh=None, policy_params=None, agent_reset=None):
  """All routes of all towns in one mixed-town batch / one rollout."""
  t0 = time.time()
  towns, eps, ids, town_idx, town_names, anns = [], [], [], [], [], []
  for ti, (town_name, town_routes) in enumerate(sorted(by_town.items())):
    imported = importer.load_town(town_name, root, rng_seed=seed)
    adapter = importer.as_synthetic_town(imported, [])
    towns.append(adapter)
    ann = importer.load_scenarios(town_name, root) if use_scenarios else {}
    for r in town_routes:
      ep = compile_route(adapter, r.keypoints_xy, r.keypoints_yaw)
      for rep in range(reps):
        eps.append(ep)
        ids.append(f"{r.route_id}_rep{rep}")
        town_idx.append(ti)
        town_names.append(town_name)
        anns.append(ann)
  if mesh is not None:
    eps, ids, (town_idx, town_names, anns) = _pad_for_mesh(
        mesh, eps, ids, (town_idx, town_names, anns))
  if verbose:
    print(f"compiled {len(eps)} episodes over {len(towns)} towns "
          f"in {time.time() - t0:.0f}s", flush=True)

  walker_sites = None
  scenario_npcs = None
  if use_scenarios:
    towns_of_eps = [towns[ti] for ti in town_idx]
    walker_sites, specs, scen_state, scenario_npcs = _scenario_setup(
        cfg, anns, eps, towns_of_eps, seed)
  maps, lanes, scene, state = build_batch(
      cfg, towns, eps, seed=seed, n_vehicles=n_vehicles,
      n_walkers=n_walkers, walker_sites=walker_sites,
      town_of_episode=town_idx, scenario_npcs=scenario_npcs)
  if use_scenarios:
    scene = scene.replace(scenarios=specs)
    state = state.replace(scenario=scen_state)
  if agent_reset is not None:
    state = state.replace(agent=agent_reset(cfg, len(eps)))
  if mesh is not None:
    maps, lanes, scene, state = _shard_episode_batch(
        mesh, maps, lanes, scene, state)
  t1 = time.time()
  final = rollout_chunked(cfg, maps, lanes, scene, state, max_ticks,
                          chunk=1024, policy=policy,
                          policy_params=policy_params)
  records = []
  for i, (rid, tn) in enumerate(zip(ids, town_names)):
    if rid is None:
      continue
    records += _records(cfg,
                        jax_tree_slice(scene, i), jax_tree_slice(final, i),
                        [rid], tn)
  if verbose:
    print(f"rollout: {len(eps)} episodes in {time.time() - t1:.0f}s",
          flush=True)
  return records, aggregate(records)


def jax_tree_slice(tree, i):
  import jax
  return jax.tree.map(
      lambda x: x[i:i + 1] if hasattr(x, "ndim") and x.ndim >= 1 else x,
      tree)


def write_endpoint(records, global_stats, path: str, meta: dict = None):
  """Leaderboard-style results JSON (checkpoint endpoint layout). `meta`
  records the exact invocation config (NPC counts, seeds, capacity) so the
  run is reproducible from the artifact alone."""
  data = {"_checkpoint": {"records": records,
                          "global_record": global_stats},
          "values": [global_stats["driving_score"],
                     global_stats["route_completion"],
                     global_stats["infraction_score"]],
          "labels": ["Avg. driving score", "Avg. route completion",
                     "Avg. infraction penalty"]}
  if meta is not None:
    data["meta"] = meta
  with open(path, "w") as f:
    json.dump(data, f, indent=2)


def print_table(records):
  """Pretty per-route results table (utils/result_writer.py analog)."""
  hdr = f"{'route':>10} {'town':>8} {'DS':>7} {'RC':>7} {'IS':>6}  status"
  lines = [hdr, "-" * len(hdr)]
  for r in records:
    s = r["scores"]
    lines.append(f"{r['route_id']:>10} {r['town']:>8} "
                 f"{s['score_composed']:>7.2f} {s['score_route']:>7.2f} "
                 f"{s['score_penalty']:>6.3f}  {r['status']}")
  print("\n".join(lines), flush=True)


def load_completed(endpoint_path: str) -> set:
  """Route ids already present in a results endpoint (resume support —
  RouteIndexer.resume / StatisticsManager.resume analog)."""
  import os
  if not os.path.exists(endpoint_path):
    return set()
  with open(endpoint_path) as f:
    data = json.load(f)
  return {r["route_id"] for r in data.get("_checkpoint", {}).get(
      "records", []) if r["status"].startswith("Completed")}


def write_csv(records, path: str):
  """Per-route CSV summary (result_parser.py analog)."""
  with open(path, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["route_id", "town", "status", "DS", "RC", "IS"] +
               list(INFRACTION_KEYS))
    for r in records:
      w.writerow([r["route_id"], r["town"], r["status"],
                  f"{r['scores']['score_composed']:.2f}",
                  f"{r['scores']['score_route']:.2f}",
                  f"{r['scores']['score_penalty']:.3f}"] +
                 [r["infractions"][k] for k in INFRACTION_KEYS])
