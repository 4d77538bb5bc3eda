"""Legacy dataset importer tests on a synthetic on-disk route directory
(the reference's jpg/png/json.gz layout, data_agent.py:341-372)."""

import gzip
import json
import os

import numpy as np
import pytest

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.train import legacy_dataset as ld


@pytest.fixture
def fake_route(tmp_path):
  from PIL import Image
  rd = tmp_path / "Route_00"
  for sub in ("rgb", "semantics", "depth", "lidar", "measurements",
              "boxes", "bev_semantics"):
    (rd / sub).mkdir(parents=True)
  rng = np.random.default_rng(0)
  for f in range(3):
    Image.fromarray(rng.integers(0, 255, (64, 128, 3), np.uint8),
                    "RGB").save(rd / "rgb" / f"{f:04d}.jpg")
    Image.fromarray(rng.integers(0, 7, (64, 128), np.uint8).astype(
        np.uint8)).save(rd / "semantics" / f"{f:04d}.png")
    Image.fromarray(rng.integers(0, 255, (64, 128, 3), np.uint8),
                    "RGB").save(rd / "depth" / f"{f:04d}.png")
    Image.fromarray(rng.integers(0, 11, (96, 96), np.uint8)).save(
        rd / "bev_semantics" / f"{f:04d}.png")
    pts = rng.uniform(-30, 30, (500, 3)).astype(np.float32)
    np.save(rd / "lidar" / f"{f:04d}.npy", pts)
    with gzip.open(rd / "measurements" / f"{f:04d}.json.gz", "wt") as fh:
      json.dump({"speed": 3.0, "target_point": [10.0, 1.0], "command": 4,
                 "steer": 0.05, "throttle": 0.6, "brake": 0.0,
                 "target_speed": 8.0}, fh)
    with gzip.open(rd / "boxes" / f"{f:04d}.json.gz", "wt") as fh:
      json.dump([{"class": "car", "position": [5, 1, 0],
                  "extent": [2.2, 1.0, 0.7], "yaw": 0.1}], fh)
  with gzip.open(rd / "results.json.gz", "wt") as fh:
    json.dump({"scores": {"score_composed": 100.0}}, fh)
  return tmp_path


def test_scan_and_quality_gate(fake_route):
  routes = ld.scan_routes(str(fake_route))
  assert len(routes) == 1
  # a failed route is filtered out
  bad = fake_route / "Route_01"
  (bad / "measurements").mkdir(parents=True)
  with gzip.open(bad / "results.json.gz", "wt") as fh:
    json.dump({"scores": {"score_composed": 71.0}}, fh)
  assert len(ld.scan_routes(str(fake_route))) == 1
  assert len(ld.scan_routes(str(fake_route), require_perfect=False)) == 2


def test_load_frame_shapes(fake_route):
  rd = ld.scan_routes(str(fake_route))[0]
  s = ld.load_frame(rd, 0, CFG)
  assert s["rgb"].shape == (64, 128, 3)
  assert s["semantic"].shape == (64, 128)
  assert s["depth"].shape == (64, 128)
  assert 0.0 <= float(s["depth"].max()) <= 1.0
  H = CFG.sensor.lidar_resolution_height
  assert s["lidar_bev"].shape == (H, H, 2)
  assert float(s["lidar_bev"].max()) <= 1.0
  assert s["speed"] == np.float32(3.0)
  assert len(s["boxes"]) == 1


def test_iterate_with_sampling(fake_route):
  samples = list(ld.iterate_dataset(str(fake_route), CFG,
                                    sampling_rate=2))
  assert len(samples) == 2     # frames 0 and 2
