"""Training on reference-layout disk datasets (the data.py:238-696 →
train.py:643-996 path), plus the matching exporter.

Two halves:
  * export_reference_layout: in-sim datagen Frames -> per-route
    directories in the reference DataAgent layout (data_agent.py:341-372):
    rgb jpg, semantics/depth png (24-bit depth encoding,
    transfuser_utils.py:579), raw LiDAR points (.npy — the documented
    stand-in for .laz: the reference compresses with laszip via laspy,
    which this image doesn't ship; `laspy` one-liner converts either way),
    boxes + measurements json.gz, results.json.gz quality gate.
  * train_transfuser_from_disk: scan_routes -> host batches (stored boxes
    splatted to CenterNet targets through the SAME centernet_targets
    used by in-sim training) -> jitted train step over transfuser_loss.

Together they close the loop: data collected by the reference stack (or
exported from this one) trains this framework's TransFuser++ directly.
"""

from __future__ import annotations

import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.models.transfuser import (LidarCenterNet,
                                                TransfuserConfig)
from carla_garage_tpu.agents.sensor_agent import command_onehot
from carla_garage_tpu.sim.datagen import (Frames, PRED_LEN,
                                          checkpoint_labels)
from carla_garage_tpu.train import legacy_dataset as ld
from carla_garage_tpu.train.transfuser_train import (centernet_targets,
                                                     render_frame_batch,
                                                     transfuser_loss)

CLASS_NAMES = {0: "car", 1: "walker", 2: "traffic_light", 3: "stop_sign"}
CLASS_IDS = {v: k for k, v in CLASS_NAMES.items()}


def _encode_depth_24bit(depth01: np.ndarray) -> np.ndarray:
  """[H,W] in [0,1] -> uint8 [H,W,3] (transfuser_utils.py:579 inverse)."""
  q = np.clip(depth01, 0.0, 1.0) * (256 ** 3 - 1)
  q = q.astype(np.int64)
  return np.stack([q % 256, (q // 256) % 256, q // 65536],
                  -1).astype(np.uint8)


def export_reference_layout(out_root: str, cfg: GlobalConfig, maps, scene,
                            frames: Frames, camera_grid, lidar_grid,
                            route_prefix: str = "route",
                            episodes=None) -> list[str]:
  """Write in-sim datagen frames as reference-layout route directories.

  One directory per episode (batch element). Episodes whose frames are all
  quality-gated out (frames.alive False everywhere) get score 0 in
  results.json.gz so scan_routes drops them — the data.py:91-95 gate.
  Returns the route dirs written."""
  from PIL import Image

  from carla_garage_tpu.sensors.lidar import render_lidar
  from carla_garage_tpu.structs import EgoState

  F, B = frames.ego_yaw.shape
  episodes = range(B) if episodes is None else episodes
  ckpt = np.asarray(checkpoint_labels(frames, scene, n_ckpt=10))
  written = []

  render = jax.jit(lambda f_idx: render_frame_batch(
      cfg, maps, scene, frames, f_idx, camera_grid, lidar_grid,
      jax.random.key(0)))

  # raw point clouds for the lidar/ directory (render_frame_batch only
  # returns the voxelized BEV)
  from carla_garage_tpu.structs import SimState, VehicleStates, WalkerStates

  def points_at(f_idx):
    take = lambda x: x[f_idx]
    V = frames.veh_yaw.shape[2]
    W = frames.wlk_yaw.shape[2]
    veh = VehicleStates(
        pos=take(frames.veh_pos), yaw=take(frames.veh_yaw),
        speed=take(frames.veh_speed), extent=take(frames.veh_extent),
        valid=take(frames.veh_valid),
        control=jnp.zeros((B, V, 3)),
        buf_vel=jnp.zeros((B, V, 1)), buf_throttle=jnp.zeros((B, V, 1)),
        buf_brake=jnp.zeros((B, V, 1)),
        lane_id=jnp.zeros((B, V), jnp.int32), lane_t=jnp.zeros((B, V)),
        stand_ticks=jnp.zeros((B, V), jnp.int32))
    wlk = WalkerStates(
        pos=take(frames.wlk_pos), yaw=take(frames.wlk_yaw),
        direction=jnp.zeros((B, W, 2)), speed=take(frames.wlk_speed),
        extent=take(frames.wlk_extent), valid=take(frames.wlk_valid),
        seen_frames=jnp.zeros((B, W), jnp.int32),
        active=jnp.zeros((B, W), bool), walked_m=jnp.zeros((B, W)))
    snap = SimState(
        tick=jnp.zeros((B,), jnp.int32), done=jnp.zeros((B,), bool),
        ego=EgoState(pos=take(frames.ego_pos), yaw=take(frames.ego_yaw),
                     speed=take(frames.ego_speed)),
        vehicles=veh, walkers=wlk, expert=None, criteria=None,
        rng=jax.random.key(0))
    return render_lidar(cfg, maps, scene, snap, lidar_grid,
                        jax.random.key(1))

  points_at = jax.jit(points_at)

  for b in episodes:
    rd = os.path.join(out_root, f"{route_prefix}_{b:03d}")
    for sub in ("rgb", "semantics", "depth", "lidar", "bev_semantics",
                "boxes", "measurements"):
      os.makedirs(os.path.join(rd, sub), exist_ok=True)
    clean = bool(np.asarray(frames.alive)[:, b].any())
    with gzip.open(os.path.join(rd, "results.json.gz"), "wt") as f:
      json.dump({"scores": {"score_composed": 100.0 if clean else 0.0}}, f)
    written.append(rd)

  for f_idx in range(F):
    batch = jax.tree.map(np.asarray, render(jnp.asarray(f_idx)))
    pts, pval = points_at(jnp.asarray(f_idx))
    pts, pval = np.asarray(pts), np.asarray(pval)
    for b in episodes:
      rd = os.path.join(out_root, f"{route_prefix}_{b:03d}")
      Image.fromarray(
          (np.clip(batch["rgb"][b], 0, 1) * 255).astype(np.uint8)).save(
          os.path.join(rd, "rgb", f"{f_idx:04d}.jpg"), quality=90)
      Image.fromarray(batch["semantic"][b].astype(np.uint8)).save(
          os.path.join(rd, "semantics", f"{f_idx:04d}.png"))
      Image.fromarray(_encode_depth_24bit(
          batch["depth"][b] / 85.0)).save(
          os.path.join(rd, "depth", f"{f_idx:04d}.png"))
      Image.fromarray(batch["bev_semantic"][b].astype(np.uint8)).save(
          os.path.join(rd, "bev_semantics", f"{f_idx:04d}.png"))
      # compressed sweep via the native codec (the reference's laszip
      # role, data_agent.py:359-369 — ~4-5x over raw float32)
      from carla_garage_tpu.utils import lidar_codec
      with open(os.path.join(rd, "lidar", f"{f_idx:04d}.lzc"), "wb") as lf:
        lf.write(lidar_codec.compress(pts[b][pval[b]].astype(np.float32)))

      # boxes in the EGO frame (data_agent.py:383-570 layout)
      from carla_garage_tpu.utils import geodesy as geo_np  # noqa: F401
      from carla_garage_tpu.sim import geometry as geo
      rel = np.asarray(geo.world_to_ego(
          jnp.asarray(batch["obj_pos"][b]),
          jnp.asarray(batch["ego_pos"][b]), jnp.asarray(
              batch["ego_yaw"][b])))
      ryaw = np.asarray(batch["obj_yaw"][b]) - batch["ego_yaw"][b]
      boxes = []
      for i in range(rel.shape[0]):
        if not batch["obj_valid"][b, i]:
          continue
        boxes.append({
            "class": CLASS_NAMES[int(batch["obj_cls"][b, i])],
            "position": [float(rel[i, 0]), float(rel[i, 1]), 0.0],
            "extent": [float(batch["obj_extent"][b, i, 0]),
                       float(batch["obj_extent"][b, i, 1]), 1.0],
            "yaw": float(ryaw[i]),
            "speed": float(batch["obj_speed"][b, i]),
            "brake": float(batch["obj_brake"][b, i]),
            "num_points": -1, "distance": float(
                np.linalg.norm(rel[i])), "id": i,
        })
      with gzip.open(os.path.join(rd, "boxes", f"{f_idx:04d}.json.gz"),
                     "wt") as f:
        json.dump(boxes, f)

      m = {
          "pos_global": [float(np.asarray(frames.ego_pos)[f_idx, b, 0]),
                         float(np.asarray(frames.ego_pos)[f_idx, b, 1])],
          "theta": float(np.asarray(frames.ego_yaw)[f_idx, b]),
          "speed": float(np.asarray(frames.ego_speed)[f_idx, b]),
          "target_speed": float(np.asarray(frames.target_speed)[f_idx, b]),
          "steer": float(np.asarray(frames.steer)[f_idx, b]),
          "throttle": float(np.asarray(frames.throttle)[f_idx, b]),
          "brake": float(np.asarray(frames.brake)[f_idx, b]),
          "command": int(np.asarray(frames.command)[f_idx, b]),
          "target_point": [float(np.asarray(frames.target_point)[
              f_idx, b, 0]), float(np.asarray(frames.target_point)[
              f_idx, b, 1])],
          "route": ckpt[f_idx, b].tolist(),
          "alive": bool(np.asarray(frames.alive)[f_idx, b]),
      }
      with gzip.open(os.path.join(
          rd, "measurements", f"{f_idx:04d}.json.gz"), "wt") as f:
        json.dump(m, f)
  return written


def _speed_class(cfg: GlobalConfig, target_speed: float,
                 brake: float) -> int:
  """target_speed_labels binning (config.py:144-148 analog)."""
  e = cfg.expert
  if brake > 0.5 or target_speed <= 0.01:
    return 0
  if target_speed <= e.target_speed_walker + 0.1:
    return 1
  if target_speed <= e.target_speed_slow + 0.1:
    return 2
  return 3


def load_disk_samples(root: str, cfg: GlobalConfig, tcfg: TransfuserConfig,
                      sampling_rate: int = 1, max_objects: int = 48):
  """Scan a reference-layout dataset into stacked training arrays.

  Stored boxes become obj_* arrays in the EGO frame (ego_pos/yaw zeroed so
  centernet_targets' world->ego transform is the identity); waypoint
  labels come from future measurements' global pose (data.py:812-838) and
  checkpoint labels from the stored route (data.py:1066-1138)."""
  routes = ld.scan_routes(root)
  per_route = []
  for rd in routes:
    meas_files = sorted(os.listdir(os.path.join(rd, "measurements")))
    ms = [ld.load_measurement(rd, int(n.split(".")[0]))
          for n in meas_files]
    per_route.append((rd, [int(n.split(".")[0]) for n in meas_files], ms))

  out = []
  for rd, frames_ids, ms in per_route:
    n = len(frames_ids)
    for i in range(0, n, sampling_rate):
      if i + PRED_LEN >= n:
        break                             # needs a full waypoint horizon
      if not ms[i].get("alive", True):
        continue
      s = ld.load_frame(rd, frames_ids[i], cfg)
      m = ms[i]
      p0 = np.asarray(m["pos_global"], np.float32)
      th0 = float(m["theta"])
      c, sn = np.cos(th0), np.sin(th0)
      rot = np.array([[c, sn], [-sn, c]], np.float32)
      wp = np.stack([
          rot @ (np.asarray(ms[i + k + 1]["pos_global"], np.float32) - p0)
          for k in range(PRED_LEN)])
      obj = np.zeros((max_objects, 8), np.float32)   # x y yaw ex ey v b cls
      valid = np.zeros((max_objects,), bool)
      for j, box in enumerate(s["boxes"][:max_objects]):
        if box["class"] == "ego_car":
          continue
        obj[j] = [box["position"][0], box["position"][1], box["yaw"],
                  box["extent"][0], box["extent"][1],
                  box.get("speed", 0.0), box.get("brake", 0.0),
                  CLASS_IDS.get(box["class"], 0)]
        valid[j] = True
      ckpt = np.asarray(m["route"], np.float32)[:tcfg.checkpoint_len]
      out.append(dict(
          rgb=s["rgb"].astype(np.float32) / 255.0,
          lidar_bev=s["lidar_bev"],
          semantic=s.get("semantic"),
          depth_norm=s.get("depth"),
          bev_semantic=s.get("bev_semantic"),
          speed=np.float32(m["speed"]),
          target_point=np.asarray(m["target_point"], np.float32),
          command=np.int32(m["command"]),
          speed_label=np.int32(_speed_class(cfg, m["target_speed"],
                                            m["brake"])),
          wp_label=wp, ckpt_label=ckpt,
          obj=obj, obj_valid=valid))
  return out


def make_disk_batch(cfg, tcfg, samples, idx, grid_hw):
  """Stack host samples -> the transfuser_loss batch dict."""
  sel = [samples[i] for i in idx]
  st = lambda k: jnp.asarray(np.stack([s[k] for s in sel]))
  obj = st("obj")
  batch = dict(
      rgb=st("rgb"), lidar_bev=st("lidar_bev"),
      speed=st("speed"), target_point=st("target_point"),
      command_onehot=command_onehot(st("command")),
      speed_label=st("speed_label"),
      wp_label=st("wp_label"), ckpt_label=st("ckpt_label"),
      obj_pos=obj[..., 0:2], obj_yaw=obj[..., 2],
      obj_extent=obj[..., 3:5], obj_speed=obj[..., 5],
      obj_brake=obj[..., 6], obj_cls=obj[..., 7].astype(jnp.int32),
      obj_valid=st("obj_valid"),
      # stored boxes are already ego-frame: identity transform
      ego_pos=jnp.zeros((len(sel), 2)), ego_yaw=jnp.zeros((len(sel),)),
      sample_w=jnp.ones((len(sel),)))
  if sel[0]["semantic"] is not None:
    # stored at the camera resolution the rig rendered (== model input res)
    batch["semantic"] = st("semantic").astype(jnp.int32)
    batch["depth_norm"] = st("depth_norm")
  if sel[0]["bev_semantic"] is not None:
    bev_ds = cfg.sensor.lidar_resolution_height // tcfg.lidar_h
    batch["bev_semantic_ds"] = st("bev_semantic")[
        :, ::bev_ds, ::bev_ds].astype(jnp.int32)
  batch["centernet"] = centernet_targets(cfg, tcfg, batch, grid_hw)
  return batch


def train_transfuser_from_disk(root: str, cfg: GlobalConfig,
                               tcfg: TransfuserConfig, steps: int = 1000,
                               batch_size: int = 8, lr: float = 3e-4,
                               sampling_rate: int = 1, seed: int = 0,
                               params=None, log_every: int = 50):
  """End-to-end: reference-layout dataset -> trained LidarCenterNet.

  Returns (params, history). The loss path is the SAME transfuser_loss as
  in-sim training (train.py:643-996 roles); only the batch source differs.
  """
  import optax

  samples = load_disk_samples(root, cfg, tcfg, sampling_rate)
  if not samples:
    raise ValueError(f"no usable samples under {root}")
  model = LidarCenterNet(tcfg)
  rng = np.random.default_rng(seed)
  grid_hw = (tcfg.lidar_h // 4, tcfg.lidar_w // 4)

  if params is None:
    b0 = make_disk_batch(cfg, tcfg, samples,
                         [0] * min(2, len(samples)), grid_hw)
    params = jax.jit(model.init)(
        jax.random.key(seed), b0["rgb"], b0["lidar_bev"],
        b0["target_point"], b0["command_onehot"], b0["speed"])
  tx = optax.chain(optax.clip_by_global_norm(1.0),
                   optax.adamw(lr, weight_decay=0.01))
  opt_state = tx.init(params)

  @jax.jit
  def step(params_, opt_state_, batch):
    (loss, aux), grads = jax.value_and_grad(
        lambda p: transfuser_loss(cfg, tcfg, model, p, batch),
        has_aux=True)(params_)
    upd, opt2 = tx.update(grads, opt_state_, params_)
    return optax.apply_updates(params_, upd), opt2, aux

  history = []
  for i in range(steps):
    idx = rng.choice(len(samples), size=min(batch_size, len(samples)),
                     replace=len(samples) < batch_size)
    batch = make_disk_batch(cfg, tcfg, samples, idx, grid_hw)
    params, opt_state, aux = step(params, opt_state, batch)
    if i % log_every == 0 or i == steps - 1:
      history.append({"step": i, "loss": float(aux["loss"])})
  return params, history
