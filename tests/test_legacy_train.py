"""Round-trip: in-sim datagen -> reference-layout export -> disk training.

Covers the data.py:238-696 -> train.py:643-996 path end-to-end: a mini
dataset is written in the reference DataAgent directory layout, re-read by
the legacy importer, stored boxes are splatted to CenterNet targets, and
the standard transfuser_loss trains on it (loss decreases)."""

import dataclasses
import gzip
import json

import jax
import numpy as np
import pytest

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.models.transfuser import micro_config
from carla_garage_tpu.sensors.camera import camera_ray_grid
from carla_garage_tpu.sensors.lidar import lidar_ray_grid
from carla_garage_tpu.sim.datagen import collect_expert_frames
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch
from carla_garage_tpu.train import legacy_dataset as ld
from carla_garage_tpu.train import legacy_train as lt

CAM = camera_ray_grid(CFG, scale=8)            # 32 x 128
LID = lidar_ray_grid(CFG, half=0, decimate=16)

TCFG = dataclasses.replace(
    micro_config(), img_h=32, img_w=128, lidar_h=256, lidar_w=256,
    img_anchors=(1, 4), lidar_anchors=(8, 8))


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
  root = tmp_path_factory.mktemp("refdata")
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=2, seed=3, n_vehicles=4, n_walkers=2)
  _, frames = jax.jit(lambda sc, st: collect_expert_frames(
      CFG, maps, lanes, sc, st, n_frames=16))(scene, state)
  routes = lt.export_reference_layout(str(root), CFG, maps, scene, frames,
                                      CAM, LID)
  return str(root), routes, frames


def test_export_layout_and_reimport(mini_dataset):
  root, routes, frames = mini_dataset
  assert len(routes) == 2
  scanned = ld.scan_routes(root)
  assert scanned, "quality gate dropped every exported route"
  rd = scanned[0]
  s = ld.load_frame(rd, 0, CFG)
  assert s["rgb"].shape == (32, 128, 3)
  assert s["lidar_bev"].shape == (256, 256, 2)
  assert s["semantic"].shape == (32, 128)
  # 24-bit depth encoding survives the round trip almost exactly
  assert s["depth"].shape == (32, 128)
  assert 0.0 <= float(s["depth"].min()) <= float(s["depth"].max()) <= 1.0
  assert s["bev_semantic"].shape[0] == CFG.sensor.lidar_resolution_height
  # measurements carry pose + labels
  m = ld.load_measurement(rd, 0)
  for k in ("pos_global", "theta", "speed", "target_speed", "command",
            "target_point", "route"):
    assert k in m, k
  # boxes carry the reference class names in the ego frame
  boxes = ld.load_boxes(rd, 0)
  assert all(b["class"] in lt.CLASS_IDS for b in boxes)


def test_quality_gate_respected(mini_dataset, tmp_path):
  root, routes, _ = mini_dataset
  # poison one route's score -> scan must drop it
  bad = routes[0]
  with gzip.open(f"{bad}/results.json.gz", "wt") as f:
    json.dump({"scores": {"score_composed": 42.0}}, f)
  try:
    assert bad not in ld.scan_routes(root)
  finally:
    with gzip.open(f"{bad}/results.json.gz", "wt") as f:
      json.dump({"scores": {"score_composed": 100.0}}, f)


def test_train_from_disk_loss_decreases(mini_dataset):
  root, _, _ = mini_dataset
  samples = lt.load_disk_samples(root, CFG, TCFG)
  assert len(samples) >= 8
  wp = samples[0]["wp_label"]
  assert wp.shape == (8, 2)
  params, hist = lt.train_transfuser_from_disk(
      root, CFG, TCFG, steps=12, batch_size=4, lr=1e-3, log_every=1)
  losses = [h["loss"] for h in hist]
  assert np.isfinite(losses).all()
  assert min(losses[-4:]) < losses[0], f"no learning: {losses}"
