"""Validate synthesized traffic-light / stop-sign placement against the
real OpenDRIVE-derived junction annotations in the reference mirror.

Ground truth: scenario trigger transforms (leaderboard/data/scenarios/),
whose Scenario7/8/9 entries sit on approaches of SIGNALIZED junctions and
Scenario10 on unsignalized ones (the CARLA leaderboard scenario taxonomy;
route_scenario_local.py consumes the same files). Where a town carries
these annotations (Town02 in the public mirror), the lane-graph extractor
also ANCHORS its junction signalization to them (lane_graph.py
signal_hints); this script reports placement error with and without the
anchor.

Metrics per annotated town:
  coverage   — fraction of unique signalized sites with a synthesized
               light within `radius` m of the site transform
  mean_err   — mean distance from each covered site to its nearest light
  false_rate — fraction of unsignalized (Scenario10) sites that
               nevertheless got a light within `radius` m

Usage: python scripts/validate_signals.py [--radius 20]
Writes results/signal_validation.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from carla_garage_tpu.maps import importer
from carla_garage_tpu.maps import lane_graph as lg

TOWNS = ["Town01", "Town02", "Town03", "Town04", "Town05", "Town06"]


def _load_raster(name: str, root: str):
  import h5py
  path = os.path.join(root, importer.MAPS_DIR, f"{name}.h5")
  with h5py.File(path, "r") as f:
    road = np.asarray(f["road"]) > 0
    yellow = np.zeros_like(road)
    for k in ("lane_marking_yellow_broken", "lane_marking_yellow_solid"):
      if k in f:
        yellow |= np.asarray(f[k]) > 0
    ppm = float(f.attrs["pixels_per_meter"])
    world_offset = np.asarray(f.attrs["world_offset_in_meters"], np.float32)
  return road, yellow, ppm, world_offset


def _site_metrics(light_pos: np.ndarray, sig: np.ndarray,
                  unsig: np.ndarray, radius: float) -> dict:
  out = {}
  if len(sig):
    if len(light_pos):
      d = np.linalg.norm(sig[:, None] - light_pos[None], axis=-1).min(1)
    else:
      d = np.full(len(sig), np.inf)
    covered = d <= radius
    out["n_signalized_sites"] = int(len(sig))
    out["coverage"] = float(covered.mean())
    out["mean_err_m"] = float(d[covered].mean()) if covered.any() else None
  if len(unsig):
    if len(light_pos):
      du = np.linalg.norm(unsig[:, None] - light_pos[None], axis=-1).min(1)
    else:
      du = np.full(len(unsig), np.inf)
    out["n_unsignalized_sites"] = int(len(unsig))
    out["false_light_rate"] = float((du <= radius).mean())
  return out


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--radius", type=float, default=20.0,
                  help="site-to-stopline match radius (site transforms sit "
                       "10-20 m up the approach lane)")
  ap.add_argument("--root", default=importer.DEFAULT_ASSETS)
  ap.add_argument("--out", default="results/signal_validation.json")
  args = ap.parse_args()

  report = {"radius_m": args.radius, "towns": {}}
  for town in TOWNS:
    try:
      road, yellow, ppm, off = _load_raster(town, args.root)
    except (OSError, FileNotFoundError, KeyError) as e:
      report["towns"][town] = {"error": str(e)}
      continue
    hints = importer.signal_hints_for(town, args.root)
    lanes = lg.build_town_lanes(road, ppm, off, yellow=yellow,
                                signal_hints=hints)
    row = {"n_lights": int(len(lanes.light_pos)),
           "n_stops": int(len(lanes.stop_pos)),
           "signal_hints_usable": hints is not None}
    if hints is not None:
      sig, unsig = hints["signalized"], hints["unsignalized"]
      row["anchored"] = _site_metrics(lanes.light_pos, sig, unsig,
                                      args.radius)
      base = lg.build_town_lanes(road, ppm, off, yellow=yellow,
                                 signal_hints=None)
      row["heuristic_only"] = _site_metrics(base.light_pos, sig, unsig,
                                            args.radius)
    # junction-placement validation against ALL unique annotated sites
    # (type-degenerate files still carry real junction-approach
    # transforms; see signal_hints_for degeneracy guard)
    try:
      sc = importer.load_scenarios(town, args.root)
    except (OSError, FileNotFoundError):
      sc = {}
    site_arrs = [v[:, :2] for k, v in sc.items()
                 if k in ("Scenario7", "Scenario8", "Scenario9",
                          "Scenario10") and len(v)]
    if site_arrs:
      sites = np.unique(np.round(np.concatenate(site_arrs), 1), axis=0)
      signals = np.concatenate([lanes.light_pos, lanes.stop_pos]) \
          if len(lanes.light_pos) or len(lanes.stop_pos) else \
          np.zeros((0, 2), np.float32)
      if len(signals):
        d = np.linalg.norm(sites[:, None] - signals[None], axis=-1).min(1)
      else:
        d = np.full(len(sites), np.inf)
      row["junction_sites"] = {
          "n_sites": int(len(sites)),
          "signal_within_radius": float((d <= args.radius).mean()),
          "mean_dist_m": float(np.minimum(d, 4 * args.radius).mean()),
          "note": ("weak signal: the mirror's per-town scenario file "
                   "lists the SAME sites under every type (incl. "
                   "Scenario1 control-loss, which occurs anywhere), so "
                   "sites are generic route positions, not verified "
                   "junction approaches — real signal ground truth is "
                   "not recoverable from the mirror")}
    report["towns"][town] = row
    print(town, json.dumps(row), flush=True)

  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  with open(args.out, "w") as f:
    json.dump(report, f, indent=1)
  print(f"wrote {args.out}")


if __name__ == "__main__":
  main()
