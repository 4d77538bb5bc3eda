"""CARLA town / benchmark importer (host side, optional assets).

Loads the reference's pre-rasterized town maps
(team_code/birds_eye_view/maps/*.h5, birdview_map.py:22-344 format), route
XMLs (leaderboard/data/longest6.xml etc.) and scenario JSONs into this
framework's tensor formats, so the real Longest6/LAV benchmarks run inside
the TPU simulator. Traffic-light trigger boxes are recovered from the
`stopline` raster layer (connected components + PCA orientation) since the
h5 files don't carry light actors; stop signs are not recoverable from the
rasters (documented limitation — Longest6 scores them with penalty 1.0
anyway, statistics_manager_local.py:28-30).
"""

from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET

import numpy as np

from carla_garage_tpu.maps.town_map import Layer

DEFAULT_ASSETS = "/root/reference"
MAPS_DIR = "team_code/birds_eye_view/maps"
ROUTES_DIR = "leaderboard/data"

LIGHT_GREEN_S = 10.0
LIGHT_YELLOW_S = 3.0
LIGHT_ALL_RED_S = 2.0


@dataclasses.dataclass
class ImportedTown:
  name: str
  raster: np.ndarray           # [C,H,W] uint8 (Layer.* channels)
  world_offset: np.ndarray     # [2]
  ppm: float
  light_pos: np.ndarray        # [L,2]
  light_yaw: np.ndarray
  light_extent: np.ndarray
  light_offset_s: np.ndarray
  light_green_s: np.ndarray
  light_yellow_s: np.ndarray
  light_red_s: np.ndarray


def assets_available(root: str = DEFAULT_ASSETS) -> bool:
  return os.path.isdir(os.path.join(root, MAPS_DIR))


def load_town(name: str, root: str = DEFAULT_ASSETS,
              rng_seed: int = 0) -> ImportedTown:
  """Load one town's h5 raster into our channel layout."""
  import h5py
  path = os.path.join(root, MAPS_DIR, f"{name}.h5")
  with h5py.File(path, "r") as f:
    road = np.asarray(f["road"]) > 0
    # benign non-road surfaces: sidewalk + parking + shoulder (hitting them
    # is an outside-lane event, not a layout collision)
    sidewalk = np.asarray(f["sidewalk"]) > 0
    if "parking" in f:
      sidewalk |= np.asarray(f["parking"]) > 0
    if "shoulder" in f:
      sidewalk |= np.asarray(f["shoulder"]) > 0
    lane_all = np.asarray(f["lane_marking_all"]) > 0
    broken = (np.asarray(f["lane_marking_white_broken"]) > 0)
    if "lane_marking_yellow_broken" in f:
      broken |= np.asarray(f["lane_marking_yellow_broken"]) > 0
    stopline = np.asarray(f["stopline"]) > 0
    ppm = float(f.attrs["pixels_per_meter"])
    world_offset = np.asarray(f.attrs["world_offset_in_meters"], np.float32)

  # junction layer is not shipped; approximate as a dilation around
  # stop-line clusters (junction speed logic also uses route curvature)
  from scipy import ndimage
  junction = ndimage.binary_dilation(stopline, iterations=int(8 * ppm))
  junction &= road

  off = ~(road | sidewalk)
  obstacle = ndimage.binary_erosion(off, iterations=int(2.5 * ppm))
  from carla_garage_tpu.maps.synthetic import ground_semantic_channel
  ground_sem = ground_semantic_channel(road, sidewalk, lane_all)
  raster = np.stack([road, sidewalk, lane_all, broken, stopline,
                     junction, obstacle]).astype(np.uint8) * 255
  raster = np.concatenate([raster, ground_sem[None]], 0)
  assert raster.shape[0] == Layer.NUM

  # --- traffic lights from stop-line blobs ---
  labels, n = ndimage.label(stopline)
  rng = np.random.default_rng(rng_seed)
  lp, ly, le, lo = [], [], [], []
  cycle = 2 * (LIGHT_GREEN_S + LIGHT_YELLOW_S + LIGHT_ALL_RED_S)
  for i in range(1, n + 1):
    ys, xs = np.nonzero(labels == i)
    if len(xs) < 4:
      continue
    cx, cy = xs.mean(), ys.mean()
    pts = np.stack([xs - cx, ys - cy], -1).astype(np.float32)
    cov = pts.T @ pts / len(pts)
    evals, evecs = np.linalg.eigh(cov)
    major = evecs[:, -1]                       # stop line direction (px)
    half_len = max(np.sqrt(max(evals[-1], 0.0)) * 2.0 / ppm, 1.0)
    world = np.array([cx, cy], np.float32) / ppm + world_offset
    yaw = np.arctan2(major[1], major[0]) + np.pi / 2   # box faces traffic
    lp.append(world)
    ly.append(yaw)
    le.append(np.array([1.5, half_len * 0.9]))
    lo.append(rng.choice([0.0, cycle / 2]))
  L = len(lp)
  return ImportedTown(
      name=name, raster=raster, world_offset=world_offset, ppm=ppm,
      light_pos=np.asarray(lp, np.float32).reshape(L, 2),
      light_yaw=np.asarray(ly, np.float32),
      light_extent=np.asarray(le, np.float32).reshape(L, 2),
      light_offset_s=np.asarray(lo, np.float32),
      light_green_s=np.full((L,), LIGHT_GREEN_S, np.float32),
      light_yellow_s=np.full((L,), LIGHT_YELLOW_S, np.float32),
      light_red_s=np.full((L,), cycle - LIGHT_GREEN_S - LIGHT_YELLOW_S,
                          np.float32))


@dataclasses.dataclass
class RouteDef:
  route_id: str
  town: str
  keypoints_xy: np.ndarray   # [K,2]
  keypoints_yaw: np.ndarray  # [K] radians


def parse_routes_xml(path: str) -> list[RouteDef]:
  """Parse a leaderboard route XML (route_parser.py format)."""
  tree = ET.parse(path)
  out = []
  for route in tree.getroot().findall("route"):
    wps = route.findall("waypoint")
    xy = np.array([[float(w.get("x")), float(w.get("y"))] for w in wps],
                  np.float32)
    yaw = np.radians(np.array([float(w.get("yaw")) for w in wps],
                              np.float32))
    out.append(RouteDef(route_id=route.get("id"), town=route.get("town"),
                        keypoints_xy=xy, keypoints_yaw=yaw))
  return out


def load_benchmark_routes(benchmark: str = "longest6",
                          root: str = DEFAULT_ASSETS) -> list[RouteDef]:
  return parse_routes_xml(os.path.join(root, ROUTES_DIR,
                                       f"{benchmark}.xml"))


def load_scenarios(town: str, root: str = DEFAULT_ASSETS) -> dict:
  """Scenario trigger transforms for a town from the public annotations
  (leaderboard/data/scenarios/all_towns_traffic_scenarios_public.json,
  parsed like RouteParser.scan_route_for_scenarios).

  Returns {scenario_type: [K,3] array of (x, y, yaw_rad)}.
  """
  import json
  path = os.path.join(root, ROUTES_DIR, "scenarios",
                      "all_towns_traffic_scenarios_public.json")
  with open(path) as f:
    data = json.load(f)
  out = {}
  for town_dict in data["available_scenarios"]:
    if town not in town_dict:
      continue
    for grp in town_dict[town]:
      rows = []
      for ev in grp["available_event_configurations"]:
        tr = ev["transform"]
        rows.append([float(tr["x"]), float(tr["y"]),
                     np.radians(float(tr["yaw"]))])
      out[grp["scenario_type"]] = np.asarray(rows, np.float32)
  return out


def scenarios_near_route(scenarios: dict, dense: np.ndarray,
                         radius: float = 8.0) -> dict:
  """Filter trigger points to those near the route, with their route
  progress index (the RouteParser trigger-matching analog)."""
  out = {}
  for k, pts in scenarios.items():
    if not len(pts):
      continue
    d = np.linalg.norm(dense[None, :, :2] - pts[:, None, :2], axis=-1)
    route_idx = d.argmin(1)
    near = d.min(1) < radius
    sel = np.nonzero(near)[0]
    out[k] = (pts[sel], route_idx[sel])
  return out


def as_synthetic_town(town: ImportedTown, route_polys: list[np.ndarray]):
  """Adapter: ImportedTown -> the scene builder's town interface.

  NPC lanes are the episode routes themselves (the behavioral stand-in for
  the TrafficManager's lane graph on real towns); stop signs are absent.
  """
  from carla_garage_tpu.maps.synthetic import SyntheticTown
  return SyntheticTown(
      raster=town.raster, world_offset=town.world_offset, ppm=town.ppm,
      light_pos=town.light_pos, light_yaw=town.light_yaw,
      light_extent=town.light_extent, light_offset_s=town.light_offset_s,
      light_green_s=town.light_green_s, light_yellow_s=town.light_yellow_s,
      light_red_s=town.light_red_s,
      stop_pos=np.zeros((0, 2), np.float32),
      stop_yaw=np.zeros((0,), np.float32),
      stop_extent=np.zeros((0, 2), np.float32),
      lane_polys=[p[::4] for p in route_polys],     # ~4 m polyline spacing
      lane_successors=[[] for _ in route_polys],
      junction_centers=np.zeros((0, 2), np.float32),
      junction_half=0.0,
      xs=np.zeros((0,)), ys=np.zeros((0,)))
