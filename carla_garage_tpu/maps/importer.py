"""CARLA town / benchmark importer (host side, optional assets).

Loads the reference's pre-rasterized town maps
(team_code/birds_eye_view/maps/*.h5, birdview_map.py:22-344 format), route
XMLs (leaderboard/data/longest6.xml etc.) and scenario JSONs into this
framework's tensor formats, so the real Longest6/LAV benchmarks run inside
the TPU simulator.

The shipped h5 files carry geometry only — their `stopline` layers are empty
and no junction/topology layer exists — so road TOPOLOGY is recovered from
the road raster by maps/lane_graph.py: a town-wide directed lane graph for
NPC traffic (the TrafficManager's lane network,
route_scenario_local.py:445-494), junction detection, synthesized traffic
lights with coordinated phases on every approach of signalized junctions
(trigger-box semantics of autopilot.py:944-1011), stop signs on unsignalized
minor entries (:1013-1070), and a per-pixel lane-direction channel for the
wrong-way criterion (atomic_criteria_local.py:1040-1233). Light placement
and phasing are synthesized (the rasters don't carry the real CARLA light
actors), so infraction counts are comparable in kind, not in exact position.
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
  stop_pos: np.ndarray         # [S,2]
  stop_yaw: np.ndarray
  stop_extent: np.ndarray
  lane_polys: list             # town-wide directed NPC lanes
  lane_successors: list
  lane_is_connector: np.ndarray


def assets_available(root: str = DEFAULT_ASSETS) -> bool:
  return os.path.isdir(os.path.join(root, MAPS_DIR))


_TOWN_CACHE: dict = {}

# bump when lane_graph recovery / ImportedTown layout changes — stale
# pickles must not survive algorithm changes
TOWN_CACHE_VERSION = 2


def load_town(name: str, root: str = DEFAULT_ASSETS,
              rng_seed: int = 0) -> ImportedTown:
  """Load one town's h5 raster + recover its lane graph / signalization.

  Results are memoized in-process AND pickled to a disk cache: the
  road-raster lane-graph recovery costs minutes per big town on one host
  core, and every process (train script, benchmark runs, tests) would
  otherwise pay it again."""
  key = (name, root, rng_seed)
  if key in _TOWN_CACHE:
    return _TOWN_CACHE[key]
  import hashlib
  import pickle
  # user-owned cache dir (never a world-writable /tmp path — pickle.load
  # of a plantable file is arbitrary code execution); the filename keys
  # the asset root and a version stamp so two roots can't collide and a
  # lane-graph algorithm change invalidates stale entries
  cache_dir = os.environ.get(
      "CGT_TOWN_CACHE", os.path.expanduser("~/.cache/cgt_town_cache"))
  os.makedirs(cache_dir, exist_ok=True)
  root_tag = hashlib.sha1(os.path.abspath(root).encode()).hexdigest()[:8]
  disk = os.path.join(
      cache_dir, f"{name}_{rng_seed}_{root_tag}_v{TOWN_CACHE_VERSION}.pkl")
  if os.path.exists(disk):
    try:
      with open(disk, "rb") as f:
        town = pickle.load(f)
      _TOWN_CACHE[key] = town
      return town
    except Exception:
      pass                       # stale/corrupt cache -> rebuild
  import h5py
  from carla_garage_tpu.maps import lane_graph as lg
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
    yellow = np.zeros_like(road)
    for k in ("lane_marking_yellow_broken", "lane_marking_yellow_solid"):
      if k in f:
        yellow |= np.asarray(f[k]) > 0
    broken |= np.asarray(f.get("lane_marking_yellow_broken",
                               np.zeros((1, 1)))) > 0
    ppm = float(f.attrs["pixels_per_meter"])
    world_offset = np.asarray(f.attrs["world_offset_in_meters"], np.float32)

  # ground-truth direction hints from every benchmark route XML touching
  # this town: the keypoint yaws come from the real OpenDRIVE map and
  # resolve one-way carriageway orientations the raster can't
  hints = []
  for bench in ("longest6", "lav", "1_3", "4_6", "debug"):
    try:
      for r in load_benchmark_routes(bench, root):
        if r.town == name:
          hints.append(np.concatenate(
              [r.keypoints_xy, r.keypoints_yaw[:, None]], -1))
    except (OSError, FileNotFoundError):
      continue
  hints = np.concatenate(hints) if hints else None

  lanes = lg.build_town_lanes(road, ppm, world_offset, yellow=yellow,
                              rng_seed=rng_seed, direction_hints=hints,
                              signal_hints=signal_hints_for(name, root))

  # junction channel: disks at detected junction nodes
  H, W = road.shape
  junction = np.zeros((H, W), bool)
  for c, r in zip(lanes.junction_centers, lanes.junction_radius):
    px, py = (c - world_offset) * ppm
    rp = int(r * ppm)
    x0, x1 = max(int(px) - rp, 0), min(int(px) + rp + 1, W)
    y0, y1 = max(int(py) - rp, 0), min(int(py) + rp + 1, H)
    yy, xx = np.mgrid[y0:y1, x0:x1]
    junction[y0:y1, x0:x1] |= (xx - px) ** 2 + (yy - py) ** 2 <= rp ** 2
  junction &= road

  # stopline channel: stamp the synthesized light trigger boxes (feeds the
  # BEV ground-truth renderer like the reference's stopline layer)
  stopline = np.zeros((H, W), bool)
  for p, yaw, e in zip(lanes.light_pos, lanes.light_yaw, lanes.light_extent):
    n = np.array([-np.sin(yaw), np.cos(yaw)])
    for t in np.linspace(-e[1], e[1], max(int(2 * e[1] * ppm), 2)):
      q = ((p + n * t - world_offset) * ppm).astype(int)
      if 0 <= q[1] < H and 0 <= q[0] < W:
        stopline[q[1], q[0]] = True

  from scipy import ndimage
  off = ~(road | sidewalk)
  obstacle = ndimage.binary_erosion(off, iterations=int(2.5 * ppm))
  from carla_garage_tpu.maps.synthetic import ground_semantic_channel
  ground_sem = ground_semantic_channel(road, sidewalk, lane_all)
  raster = np.stack([road, sidewalk, lane_all, broken, stopline,
                     junction, obstacle]).astype(np.uint8) * 255
  raster = np.concatenate([raster, ground_sem[None],
                           lanes.direction_raster[None]], 0)
  assert raster.shape[0] == Layer.NUM

  # per-town deterministic phase assignment already encoded in offsets;
  # add a small seeded stagger across junctions so the whole town doesn't
  # switch in lockstep
  rng = np.random.default_rng(rng_seed)
  cycle = 2 * (LIGHT_GREEN_S + LIGHT_YELLOW_S + LIGHT_ALL_RED_S)
  L = len(lanes.light_pos)
  stagger = np.zeros((L,), np.float32)
  if L and len(lanes.junction_centers):
    d = np.linalg.norm(lanes.light_pos[:, None] -
                       lanes.junction_centers[None], axis=-1)
    jid = d.argmin(1)
    per_junction = rng.uniform(0.0, cycle,
                               size=len(lanes.junction_centers))
    stagger = per_junction[jid].astype(np.float32)

  town = ImportedTown(
      name=name, raster=raster, world_offset=world_offset, ppm=ppm,
      light_pos=lanes.light_pos, light_yaw=lanes.light_yaw,
      light_extent=lanes.light_extent,
      light_offset_s=lanes.light_offset_s + stagger,
      light_green_s=lanes.light_green_s,
      light_yellow_s=lanes.light_yellow_s,
      light_red_s=lanes.light_red_s,
      stop_pos=lanes.stop_pos, stop_yaw=lanes.stop_yaw,
      stop_extent=lanes.stop_extent,
      lane_polys=lanes.lane_polys, lane_successors=lanes.lane_successors,
      lane_is_connector=lanes.is_connector)
  _TOWN_CACHE[key] = town
  try:
    with open(disk + ".tmp", "wb") as f:
      pickle.dump(town, f)
    os.replace(disk + ".tmp", disk)   # atomic: parallel procs see whole files
  except Exception:
    pass
  return town


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
  out = {}
  # the public all-towns file carries Scenario1/3/4; the per-town
  # "*_all_scenarios" files add Scenario7-10 (junction) transforms —
  # all are real OpenDRIVE-derived positions
  files = ["all_towns_traffic_scenarios_public.json",
           f"{town.lower()}_all_scenarios.json"]
  for fname in files:
    path = os.path.join(root, ROUTES_DIR, "scenarios", fname)
    if not os.path.exists(path):
      continue
    with open(path) as f:
      data = json.load(f)
    for town_dict in data["available_scenarios"]:
      if town not in town_dict:
        continue
      for grp in town_dict[town]:
        rows = []
        for ev in grp["available_event_configurations"]:
          tr = ev["transform"]
          rows.append([float(tr["x"]), float(tr["y"]),
                       np.radians(float(tr["yaw"]))])
        arr = np.asarray(rows, np.float32)
        # the junction files repeat one transform per actor config —
        # dedupe to unique sites
        arr = np.unique(np.round(arr, 2), axis=0)
        k = grp["scenario_type"]
        out[k] = arr if k not in out else np.unique(
            np.concatenate([out[k], arr]), axis=0)
  return out


def signal_hints_for(town: str, root: str = DEFAULT_ASSETS) -> dict | None:
  """Real signalization ground truth where the annotations carry it:
  Scenario7/8/9 trigger points sit on approaches of SIGNALIZED junctions,
  Scenario10 on unsignalized ones (CARLA scenario taxonomy). Returns
  {'signalized': [N,2], 'unsignalized': [M,2]} or None."""
  try:
    sc = load_scenarios(town, root)
  except (OSError, FileNotFoundError):
    return None
  dedup = lambda arrs: np.unique(np.round(np.concatenate(arrs), 1), axis=0) \
      if arrs else np.zeros((0, 2), np.float32)
  sig = dedup([sc[k][:, :2] for k in ("Scenario7", "Scenario8", "Scenario9")
               if k in sc and len(sc[k])])
  unsig = dedup([sc[k][:, :2] for k in ("Scenario10",)
                 if k in sc and len(sc[k])])
  if not len(sig) and not len(unsig):
    return None
  # Degeneracy guard: the mirror's town02_all_scenarios.json lists the
  # SAME site set under every scenario type (a blanket data-collection
  # file, not a curated taxonomy), so Scenario7-9 vs Scenario10 carry no
  # signalization information there. If the signalized and unsignalized
  # site sets substantially overlap, the annotation is uninformative.
  if len(sig) and len(unsig):
    d = np.linalg.norm(sig[:, None] - unsig[None], axis=-1).min(1)
    if (d < 1.0).mean() > 0.5:
      return None
  return dict(signalized=sig, unsignalized=unsig)


def scenarios_near_route(scenarios: dict, dense: np.ndarray,
                         radius: float = 8.0,
                         yaw_tol: float = np.radians(20.0)) -> dict:
  """Filter trigger points to those near the route AND facing the route's
  travel direction, with their route progress index.

  The reference RouteParser matches a trigger to the route by position
  (TRIGGER_THRESHOLD = 2 m) *and* heading (TRIGGER_ANGLE_THRESHOLD = 10°,
  route_parser.py:19-20,137-138) — without the heading gate, annotations
  belonging to the CROSS street of a junction attach to the ego's route
  and spawn e.g. crossing walkers that walk along (not across) the ego's
  road. The yaw test is evaluated per dense point so a self-overlapping
  route matches the pass whose direction agrees with the annotation."""
  seg = np.diff(dense[:, :2], axis=0)
  ryaw = np.arctan2(seg[:, 1], seg[:, 0])
  ryaw = np.append(ryaw, ryaw[-1])                       # [N]
  out = {}
  for k, pts in scenarios.items():
    if not len(pts):
      continue
    d = np.linalg.norm(dense[None, :, :2] - pts[:, None, :2], axis=-1)
    dyaw = np.abs(np.arctan2(np.sin(pts[:, 2:3] - ryaw[None]),
                             np.cos(pts[:, 2:3] - ryaw[None])))   # [K,N]
    ok = (d < radius) & (dyaw < yaw_tol)
    near = ok.any(1)
    route_idx = np.where(ok, d, np.inf).argmin(1)
    sel = np.nonzero(near)[0]
    out[k] = (pts[sel], route_idx[sel])
  return out


def as_synthetic_town(town: ImportedTown,
                      route_polys: list | None = None):
  """Adapter: ImportedTown -> the scene builder's town interface.

  NPC lanes are the town-wide directed lane graph recovered from the road
  raster; lights/stops are the synthesized signalization. `route_polys`
  is accepted for backward compatibility and ignored (the lane graph
  replaced per-route NPC lanes)."""
  from carla_garage_tpu.maps.synthetic import SyntheticTown
  return SyntheticTown(
      raster=town.raster, world_offset=town.world_offset, ppm=town.ppm,
      light_pos=town.light_pos, light_yaw=town.light_yaw,
      light_extent=town.light_extent, light_offset_s=town.light_offset_s,
      light_green_s=town.light_green_s, light_yellow_s=town.light_yellow_s,
      light_red_s=town.light_red_s,
      stop_pos=town.stop_pos,
      stop_yaw=town.stop_yaw,
      stop_extent=town.stop_extent,
      lane_polys=town.lane_polys,
      lane_successors=town.lane_successors,
      junction_centers=np.zeros((0, 2), np.float32),  # use raster channel
      junction_half=0.0,
      xs=np.zeros((0,)), ys=np.zeros((0,)))
