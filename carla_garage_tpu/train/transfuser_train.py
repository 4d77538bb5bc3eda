"""TransFuser++ imitation-learning training — sensors rendered on device.

Replaces the reference's disk pipeline (jpg/laz files + DataLoader workers,
data.py:238-696) and train.py's DDP loop for the sensor-fusion model:
training frames come from expert rollouts; camera, LiDAR and all label
channels (semantic, depth, BEV semantics, CenterNet targets) are rendered
ON DEVICE at the recorded poses. Loss assembly mirrors
model.compute_loss (model.py:394-445) with train.py's normalized loss
weights (:384-456).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from carla_garage_tpu.agents.sensor_agent import command_onehot
from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.models.transfuser import LidarCenterNet, TransfuserConfig
from carla_garage_tpu.ops import detection as det
from carla_garage_tpu.ops.losses import cross_entropy, l1_masked
from carla_garage_tpu.sensors.bev import render_bev_semantics
from carla_garage_tpu.sensors.camera import render_camera
from carla_garage_tpu.sensors.lidar import render_lidar
from carla_garage_tpu.sensors.voxelize import voxelize, voxelize_matmul
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.sim.datagen import (Frames, checkpoint_labels,
                                          target_speed_labels,
                                          waypoint_labels)
from carla_garage_tpu.structs import Scene, SimState
from carla_garage_tpu.train.plant_train import SPEED_WEIGHTS


def render_frame_batch(cfg: GlobalConfig, maps, scene: Scene,
                       frames: Frames, f_idx: int, camera_grid,
                       lidar_grid, rng):
  """Render model inputs + labels for frame index f_idx across the batch.

  Reconstructs a SimState snapshot from the recorded frame and reuses the
  live sensor renderers — datagen and inference share one code path.
  """
  take = lambda x: x[f_idx]
  from carla_garage_tpu.structs import EgoState, VehicleStates, WalkerStates
  B, V = frames.veh_yaw.shape[1:3]
  W = frames.wlk_yaw.shape[2]
  sb = 1
  ego = EgoState(pos=take(frames.ego_pos), yaw=take(frames.ego_yaw),
                 speed=take(frames.ego_speed))
  veh = VehicleStates(
      pos=take(frames.veh_pos), yaw=take(frames.veh_yaw),
      speed=take(frames.veh_speed), extent=take(frames.veh_extent),
      valid=take(frames.veh_valid),
      control=jnp.zeros((B, V, 3)).at[..., 2].set(take(frames.veh_brake)),
      buf_vel=jnp.zeros((B, V, sb)), buf_throttle=jnp.zeros((B, V, sb)),
      buf_brake=jnp.zeros((B, V, sb)),
      lane_id=jnp.zeros((B, V), jnp.int32), lane_t=jnp.zeros((B, V)),
      stand_ticks=jnp.zeros((B, V), jnp.int32))
  wlk = WalkerStates(
      pos=take(frames.wlk_pos), yaw=take(frames.wlk_yaw),
      direction=jnp.zeros((B, W, 2)), speed=take(frames.wlk_speed),
      extent=take(frames.wlk_extent), valid=take(frames.wlk_valid),
      seen_frames=jnp.zeros((B, W), jnp.int32),
      active=jnp.zeros((B, W), bool), walked_m=jnp.zeros((B, W)))
  # tick from the recorded sim time: the camera colors lights by their
  # CURRENT state (state_at(time_s)), so the training render must carry
  # the frame's clock or every light would render at its t=0 phase
  snap = SimState(tick=jnp.round(take(frames.time_s) * 20.0)
                  .astype(jnp.int32),
                  done=jnp.zeros((B,), bool), ego=ego, vehicles=veh,
                  walkers=wlk, expert=None, criteria=None, rng=rng)

  cam = render_camera(cfg, maps, scene, snap, camera_grid)
  pts, valid = render_lidar(cfg, maps, scene, snap, lidar_grid, rng)
  lidar_bev = jax.vmap(lambda p, v: voxelize_matmul(p, v, cfg))(pts, valid)
  lidar_bev = jnp.transpose(lidar_bev, (0, 2, 3, 1))
  bev_sem = render_bev_semantics(cfg, maps, scene, snap)

  # detection candidates over ALL four CenterNet classes (the reference's
  # GT boxes carry vehicle 0 / walker 1 / traffic light 2 / stop sign 3,
  # data_agent.py:383-570) — red/yellow lights at the frame's sim time
  from carla_garage_tpu.structs import LightState
  lights, stops = scene.lights, scene.stops
  t_s = take(frames.time_s)
  lstate = lights.state_at(t_s)
  l_ok = lights.valid & ((lstate == LightState.RED) |
                         (lstate == LightState.YELLOW))
  zl = jnp.zeros_like(lights.yaw)
  zs = jnp.zeros_like(stops.yaw)
  L, S = lights.yaw.shape[-1], stops.yaw.shape[-1]
  obj_pos = jnp.concatenate([veh.pos, wlk.pos, lights.pos, stops.pos], 1)
  obj_yaw = jnp.concatenate([veh.yaw, wlk.yaw, lights.yaw, stops.yaw], 1)
  obj_extent = jnp.concatenate(
      [veh.extent, wlk.extent, lights.extent, stops.extent], 1)
  # LiDAR-visibility gate for dynamic agents (data.py:959-960: boxes with
  # <= num_lidar_hits_for_detection=7 sweep points are dropped from the
  # detection labels; lights/stops are map objects and stay, data_agent.py
  # num_points only set for 'car'/'walker'). Without it the heatmap is
  # supervised to fire on occluded objects the sensors cannot see.
  dyn_pos = jnp.concatenate([veh.pos, wlk.pos], 1)          # [B,D,2]
  dyn_yaw = jnp.concatenate([veh.yaw, wlk.yaw], 1)
  dyn_ext = jnp.concatenate([veh.extent, wlk.extent], 1)
  rel_d = geo.world_to_ego(dyn_pos, ego.pos[:, None], ego.yaw[:, None])
  # render_lidar points are already ego-frame -> point-in-OBB per object
  d = pts[:, None, :, :2] - rel_d[:, :, None]                # [B,D,N,2]
  cy, sy = jnp.cos(dyn_yaw - ego.yaw[:, None]), \
      jnp.sin(dyn_yaw - ego.yaw[:, None])
  lx = d[..., 0] * cy[..., None] + d[..., 1] * sy[..., None]
  ly = -d[..., 0] * sy[..., None] + d[..., 1] * cy[..., None]
  inside = (jnp.abs(lx) <= dyn_ext[..., 0:1] + 0.1) & \
      (jnp.abs(ly) <= dyn_ext[..., 1:2] + 0.1) & valid[:, None]
  n_hits = jnp.sum(inside, axis=-1)                          # [B,D]
  seen = n_hits > 7
  obj_valid = jnp.concatenate(
      [veh.valid & seen[:, :V], wlk.valid & seen[:, V:],
       l_ok, stops.valid], 1)
  obj_speed = jnp.concatenate([veh.speed, wlk.speed, zl, zs], 1)
  obj_brake = jnp.concatenate(
      [take(frames.veh_brake), jnp.zeros_like(wlk.speed), zl, zs], 1)
  obj_cls = jnp.concatenate([
      jnp.zeros((B, V), jnp.int32), jnp.ones((B, W), jnp.int32),
      jnp.full((B, L), 2, jnp.int32), jnp.full((B, S), 3, jnp.int32)], 1)

  return dict(rgb=cam["rgb"], semantic=cam["semantic"],
              depth=cam["depth"], lidar_bev=lidar_bev,
              bev_semantic=bev_sem,
              obj_pos=obj_pos, obj_yaw=obj_yaw, obj_extent=obj_extent,
              obj_valid=obj_valid, obj_speed=obj_speed,
              obj_brake=obj_brake, obj_cls=obj_cls,
              ego_pos=ego.pos, ego_yaw=ego.yaw, speed=ego.speed,
              target_point=take(frames.target_point),
              command=take(frames.command))


def centernet_targets(cfg: GlobalConfig, tcfg: TransfuserConfig, batch,
                      grid_hw: tuple):
  """CenterNet training targets on the BEV feature grid (data.py:698-791).

  Boxes = all recorded objects (vehicle/walker/red light/stop sign class
  channels) in the ego frame, gridded at the model's BEV stride. Returns
  dict of [B,h,w,*] targets + a box mask.
  """
  h, w = grid_hw
  sc = cfg.sensor
  ppm_grid = h / (sc.max_y - sc.min_y)          # cells per meter
  rel = geo.world_to_ego(batch["obj_pos"], batch["ego_pos"][:, None],
                         batch["ego_yaw"][:, None])
  ryaw = geo.normalize_angle(batch["obj_yaw"] - batch["ego_yaw"][:, None])
  cx = (rel[..., 0] - sc.min_x) * ppm_grid       # grid col
  cy = (rel[..., 1] - sc.min_y) * ppm_grid       # grid row
  inb = batch["obj_valid"] & (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
  gw = batch["obj_extent"][..., 1] * 2 * ppm_grid
  gl = batch["obj_extent"][..., 0] * 2 * ppm_grid
  radius = jnp.maximum(det.gaussian_radius(gw, gl), 2.0)
  centers = jnp.stack([cx, cy], -1)
  heat = jax.vmap(lambda c, r, v, cl: det.splat_gaussian_heatmap(
      h, w, c, r, v, cl, tcfg.num_bb_classes))(
      centers, radius, inb, batch["obj_cls"])
  n_bins = tcfg.num_dir_bins
  angle_per = 2 * jnp.pi / n_bins
  yaw_pos = jnp.mod(ryaw, 2 * jnp.pi)
  yaw_cls = jnp.floor(yaw_pos / angle_per).astype(jnp.int32) % n_bins
  yaw_res = yaw_pos - yaw_cls * angle_per
  return dict(heatmap=heat, center=centers, mask=inb,
              wh=jnp.stack([gw, gl], -1),
              yaw_cls=yaw_cls, yaw_res=yaw_res,
              velocity=batch["obj_speed"], brake=batch["obj_brake"])


# normalized loss weights (train.py:384-456 defaults — all 1.0 here)
LOSS_WEIGHTS = dict(wp=1.0, checkpoint=1.0, target_speed=1.0, semantic=1.0,
                    bev_semantic=1.0, depth=1.0, center_heatmap=1.0,
                    wh=1.0, offset=1.0, yaw_class=1.0, yaw_res=1.0,
                    velocity=1.0, brake=1.0)


def mean_iou(pred_cls: jnp.ndarray, label: jnp.ndarray,
             num_classes: int) -> jnp.ndarray:
  """Mean intersection-over-union over classes present in the labels —
  the reference's val metric (train.py:822-843 semantic/BEV mIoU)."""
  ious = []
  present = []
  for c in range(num_classes):
    p = pred_cls == c
    l = label == c
    inter = jnp.sum(p & l)
    union = jnp.sum(p | l)
    ious.append(inter / jnp.maximum(union, 1))
    present.append(jnp.any(l))
  ious = jnp.stack(ious)
  present = jnp.stack(present)
  return jnp.sum(jnp.where(present, ious, 0.0)) / \
      jnp.maximum(jnp.sum(present), 1)


def transfuser_loss(cfg: GlobalConfig, tcfg: TransfuserConfig,
                    model: LidarCenterNet, params, batch, log_vars=None,
                    speed_weights=SPEED_WEIGHTS):
  out = model.apply(params, batch["rgb"], batch["lidar_bev"],
                    batch["target_point"], batch["command_onehot"],
                    batch["speed"])
  out = jax.tree.map(lambda x: x.astype(jnp.float32), out)
  # per-sample quality weights [B] (the reference drops non-perfect expert
  # routes from the dataset, data.py:91-95; post-done frames weigh 0)
  sw = batch.get("sample_w")
  if sw is None:
    sw = jnp.ones_like(batch["speed"])
  swn = jnp.maximum(jnp.sum(sw), 1e-6)

  def wmean(x):
    per = x.reshape(x.shape[0], -1).mean(1)
    return jnp.sum(per * sw) / swn

  losses = {}
  losses["checkpoint"] = wmean(
      jnp.abs(out["pred_checkpoint"] - batch["ckpt_label"]))
  losses["target_speed"] = cross_entropy(
      out["pred_target_speed"], batch["speed_label"],
      weights=speed_weights, label_smoothing=0.1, sample_weight=sw)
  if "pred_wp" in out:
    # wp_w=0 for DAgger-collected frames: their "future ego positions" are
    # the learned policy's own (wrong) trajectory, not expert waypoints
    losses["wp"] = wmean(jnp.abs(out["pred_wp"] - batch["wp_label"])) * \
        batch.get("wp_w", 1.0)
  if "pred_semantic" in out:
    losses["semantic"] = cross_entropy(out["pred_semantic"],
                                       batch["semantic"], sample_weight=sw)
  if "pred_depth" in out:
    losses["depth"] = wmean(jnp.abs(out["pred_depth"] -
                                    batch["depth_norm"]))
  if "pred_bev_semantic" in out:
    bev_lab = batch["bev_semantic_ds"]
    losses["bev_semantic"] = cross_entropy(out["pred_bev_semantic"],
                                           bev_lab, sample_weight=sw)
  if "pred_bb" in out:
    bb = out["pred_bb"]
    tgt = batch["centernet"]
    pred_heat = jax.nn.sigmoid(bb["heatmap"])
    losses["center_heatmap"] = wmean(
        det.gaussian_focal_loss(pred_heat, tgt["heatmap"]))
    h, w = bb["wh"].shape[1:3]
    ix = jnp.clip(tgt["center"][..., 0].astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(tgt["center"][..., 1].astype(jnp.int32), 0, h - 1)

    def gather(m):
      flat = m.reshape(m.shape[0], h * w, -1)
      return jnp.take_along_axis(flat, (iy * w + ix)[..., None], 1)

    mask = tgt["mask"] & (sw[:, None] > 0)
    losses["wh"] = l1_masked(gather(bb["wh"]), tgt["wh"], mask)
    off_t = tgt["center"] - jnp.floor(tgt["center"])
    losses["offset"] = l1_masked(gather(bb["offset"]), off_t, mask)
    losses["yaw_res"] = l1_masked(gather(bb["yaw_res"])[..., 0],
                                  tgt["yaw_res"], mask)
    losses["velocity"] = l1_masked(gather(bb["velocity"])[..., 0],
                                   tgt["velocity"], mask)
    yc_logits = gather(bb["yaw_class"])
    yc = jnp.sum(jnp.where(
        mask[..., None], -jax.nn.log_softmax(yc_logits) *
        jax.nn.one_hot(tgt["yaw_cls"], yc_logits.shape[-1]), 0.0))
    losses["yaw_class"] = yc / jnp.maximum(jnp.sum(mask), 1.0)
    br_logits = gather(bb["brake"])
    br_lab = (tgt["brake"] > 0.5).astype(jnp.int32)
    br = jnp.sum(jnp.where(
        mask[..., None], -jax.nn.log_softmax(br_logits) *
        jax.nn.one_hot(br_lab, 2), 0.0))
    losses["brake"] = br / jnp.maximum(jnp.sum(mask), 1.0)

  if log_vars is not None:
    # Kendall learned multi-task weighting (train.py:384-456)
    from carla_garage_tpu.train.schedules import uncertainty_weighted_total
    total = uncertainty_weighted_total(losses, log_vars)
  else:
    total = sum(LOSS_WEIGHTS[k] * v for k, v in losses.items())
  aux = {f"loss_{k}": v for k, v in losses.items()}
  aux["loss"] = total
  return total, aux


def make_transfuser_train_step(cfg: GlobalConfig, tcfg: TransfuserConfig,
                               model: LidarCenterNet, tx, maps, scene,
                               frames: Frames, camera_grid, lidar_grid,
                               learn_loss_weights: bool = False,
                               bf16: bool = False,
                               speed_weights=SPEED_WEIGHTS):
  """Returns (train_step, eval_step, wp_valid).

  train_step is a jitted (trainable, opt_state, f_idx, rng, maps, scene,
  frames) -> ... step that renders the frame's sensors + labels on the fly
  — no stored dataset. maps/scene/frames are passed THROUGH the jit as
  arguments (NOT closed over: MB-scale arrays baked as compile-time
  constants make remote XLA compiles pathologically slow). With
  learn_loss_weights the trainable is (params, log_vars) Kendall-weighted.
  eval_step(params, f_idx, rng, maps, scene, frames) computes validation
  losses plus semantic/BEV-semantic mIoU (train.py:822-843).

  bf16=True renders + runs the model forward/backward in bfloat16 (params
  and optimizer state stay f32 — mixed precision as the MXU wants it)."""
  _, wp_valid = waypoint_labels(frames)
  # detection grid = BEV feature grid at stride 4 (the reference's top_down
  # output, bev_down_sample_factor=4, transfuser.py:114-137)
  grid_hw = (tcfg.lidar_h // 4, tcfg.lidar_w // 4)
  # label stride: rendered BEV resolution -> bev-semantic head output size
  # (the head now upsamples to the model's full lidar res, model.py:74-91)
  bev_ds = cfg.sensor.lidar_resolution_height // tcfg.lidar_h

  def make_batch(maps_, scene_, frames_, f_idx, rng):
    rendered = render_frame_batch(cfg, maps_, scene_, frames_, f_idx,
                                  camera_grid, lidar_grid, rng)
    batch = dict(rendered)
    # velocity-input dropout: zero the measured speed for 15% of samples so
    # the model cannot learn the "speed==0 => brake" shortcut (the velocity
    # bias analyzed by the reference paper; closed-loop launches depend on
    # predicting GO at standstill)
    drop = jax.random.bernoulli(jax.random.fold_in(rng, 7), 0.15,
                                rendered["speed"].shape)
    batch["speed"] = jnp.where(drop, 0.0, rendered["speed"])
    batch["depth_norm"] = rendered["depth"] / 85.0
    batch["command_onehot"] = command_onehot(rendered["command"])
    wp_, _ = waypoint_labels(frames_)
    batch["wp_label"] = wp_[f_idx]
    batch["ckpt_label"] = checkpoint_labels(
        frames_, scene_, tcfg.checkpoint_len)[f_idx]
    # brake_lookahead=2 frames (0.5 s at the 4 Hz save rate) — label brake
    # if the expert brakes within the forecast horizon (forcast_time,
    # ref config.py:544); anticipatory supervision the closed-loop policy
    # needs to start braking BEFORE the expert's hazard flag latches
    batch["speed_label"] = target_speed_labels(
        frames_, cfg, brake_lookahead=2)[f_idx]
    batch["bev_semantic_ds"] = rendered["bev_semantic"][
        :, ::bev_ds, ::bev_ds].astype(jnp.int32)
    batch["centernet"] = centernet_targets(cfg, tcfg, batch, grid_hw)
    batch["sample_w"] = frames_.alive[f_idx].astype(jnp.float32)
    if bf16:
      for k in ("rgb", "lidar_bev"):
        batch[k] = batch[k].astype(jnp.bfloat16)
    return batch

  def make_flat_batch(maps_, scene_, frames_, f_idx, rng):
    # f_idx [K] frame indices — sequential renders, concatenated batch
    rngs = jax.random.split(rng, f_idx.shape[0])
    batches = jax.lax.map(
        lambda a: make_batch(maps_, scene_, frames_, a[0], a[1]),
        (f_idx, rngs))
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), batches)

  def cast_params(p):
    if not bf16:
      return p
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, p)

  def loss_fn(trainable, f_idx, rng, maps_, scene_, frames_, wp_w=1.0):
    batch = make_flat_batch(maps_, scene_, frames_, f_idx, rng)
    batch["wp_w"] = wp_w
    if learn_loss_weights:
      params, log_vars = trainable
      return transfuser_loss(cfg, tcfg, model, cast_params(params), batch,
                             log_vars=log_vars,
                             speed_weights=speed_weights)
    return transfuser_loss(cfg, tcfg, model, cast_params(trainable), batch,
                           speed_weights=speed_weights)

  def micro_loss(trainable, fi, rng, maps_, scene_, frames_, wp_w):
    """Loss on ONE rendered frame index (micro-batch = the episode axis)."""
    return loss_fn(trainable, fi[None], rng, maps_, scene_, frames_, wp_w)

  from functools import partial

  @partial(jax.jit, donate_argnums=(0, 1))
  def train_step(trainable, opt_state, f_idx, rng, maps_, scene_, frames_,
                 wp_w=1.0):
    # donate params + opt state: without donation XLA holds OLD and NEW
    # copies of both across the update (~1.4 GB at 120M params), which
    # alone is the difference between fitting and OOM once the six town
    # rasters (~1.6 GB) are resident. Callers must not reuse the passed-in
    # arrays afterwards (snapshot to host for best-checkpoint keeping).
    # Gradient accumulation over the frame indices: the full-spec model
    # (regnety_032, 1024x256) OOMs beyond a 16-sample fwd/bwd on one v5e
    # chip, so the effective batch (the reference's 64, config.py:171-173)
    # is built as a lax.scan of micro-batch grads — peak memory stays at
    # one micro-batch plus an f32 grad accumulator.
    K = f_idx.shape[0]
    rngs = jax.random.split(rng, K)
    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def micro(carry, x):
      g_acc, loss_acc, aux_acc = carry
      fi, r = x
      (loss, aux), g = grad_fn(trainable, fi, r, maps_, scene_, frames_,
                               wp_w)
      g_acc = jax.tree.map(
          lambda a, b: a + b.astype(jnp.float32) / K, g_acc, g)
      aux_acc = jax.tree.map(lambda a, b: a + b / K, aux_acc, aux)
      return (g_acc, loss_acc + loss / K, aux_acc), None

    zero_g = jax.tree.map(
        lambda p: jnp.zeros(p.shape, jnp.float32), trainable)
    _, zero_aux = jax.eval_shape(
        lambda: micro_loss(trainable, f_idx[0], rngs[0], maps_, scene_,
                           frames_, wp_w))
    zero_aux = jax.tree.map(lambda s: jnp.zeros((), jnp.float32), zero_aux)
    (grads, _, aux), _ = jax.lax.scan(
        micro, (zero_g, jnp.zeros(()), zero_aux), (f_idx, rngs))
    updates, opt_state = tx.update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    return trainable, opt_state, aux

  @jax.jit
  def eval_step(params, f_idx, rng, maps_, scene_, frames_):
    batch = make_flat_batch(maps_, scene_, frames_, f_idx, rng)
    _, aux = transfuser_loss(cfg, tcfg, model, cast_params(params), batch,
                             speed_weights=speed_weights)
    out = model.apply(cast_params(params), batch["rgb"], batch["lidar_bev"],
                      batch["target_point"], batch["command_onehot"],
                      batch["speed"])
    if "pred_semantic" in out:
      aux["miou_semantic"] = mean_iou(
          jnp.argmax(out["pred_semantic"], -1), batch["semantic"],
          cfg.sensor.num_semantic_classes)
    if "pred_bev_semantic" in out:
      aux["miou_bev_semantic"] = mean_iou(
          jnp.argmax(out["pred_bev_semantic"], -1),
          batch["bev_semantic_ds"], cfg.sensor.num_bev_semantic_classes)
    # open-loop diagnosis heads (the offline metrics VERDICT r3 asked for
    # before any new loss knob): speed-class confusion — brake recall is
    # the missed-hazard knob — and the DIRECT controller's actual steering
    # input, the angle of checkpoint[2], as MAE vs the expert label
    out_f = jax.tree.map(lambda x: x.astype(jnp.float32), out)
    sw = batch["sample_w"] > 0
    pred_cls = jnp.argmax(out_f["pred_target_speed"], -1)
    lab = batch["speed_label"]
    aux["confusion"] = jnp.zeros((4, 4), jnp.int32).at[
        lab, pred_cls].add(sw.astype(jnp.int32))
    ang = lambda a: jnp.degrees(jnp.arctan2(a[..., 1], a[..., 0]))
    d_ang = jnp.abs(geo.normalize_angle(
        jnp.radians(ang(out_f["pred_checkpoint"][:, 2]) -
                    ang(batch["ckpt_label"][:, 2]))))
    aux["ckpt_angle_mae_deg"] = jnp.degrees(
        jnp.sum(jnp.where(sw, d_ang, 0.0)) /
        jnp.maximum(jnp.sum(sw), 1))
    return aux

  return train_step, eval_step, wp_valid


def train_transfuser(cfg: GlobalConfig, tcfg: TransfuserConfig, maps, scene,
                     frames: Frames, camera_grid, lidar_grid,
                     steps: int = 100, lr: float = 3e-4, seed: int = 0,
                     params=None, log_every: int = 50,
                     freeze_backbone: bool = False,
                     schedule: str | None = "multistep",
                     learn_loss_weights: bool = False,
                     val_fraction: float = 0.1,
                     bf16: bool = False, frames_per_step: int = 2):
  """On-device training loop over collected frames.

  freeze_backbone freezes the image branch for two-stage training
  (config.py:253, README.md:142-147). schedule wires the train.py LR
  schedules (:588-598); learn_loss_weights enables Kendall multi-task
  weighting (:384-456); a held-out val frame split reports val losses and
  semantic/BEV mIoU at the end (:822-843)."""
  from carla_garage_tpu.train.plant_train import make_schedule
  model = LidarCenterNet(tcfg)
  rng = jax.random.key(seed)
  if params is None:
    B = frames.ego_yaw.shape[1]
    rgb0 = jnp.zeros((B, tcfg.img_h, tcfg.img_w, 3))
    lid0 = jnp.zeros((B, tcfg.lidar_h, tcfg.lidar_w, tcfg.lidar_channels))
    params = model.init(rng, rgb0, lid0, jnp.zeros((B, 2)),
                        jnp.zeros((B, 6)), jnp.zeros((B,)))
  tx = optax.adamw(make_schedule(schedule, lr, steps), weight_decay=0.01)
  if freeze_backbone:
    def label_fn(tree):
      return jax.tree_util.tree_map_with_path(
          lambda path, _: "frozen" if any(
              "image_" in str(getattr(k, "key", "")) for k in path)
          else "train", tree)
    tx = optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label_fn)
  step_fn, eval_fn, wp_valid = make_transfuser_train_step(
      cfg, tcfg, model, tx, maps, scene, frames, camera_grid, lidar_grid,
      learn_loss_weights=learn_loss_weights, bf16=bf16)
  if learn_loss_weights:
    from carla_garage_tpu.train.schedules import init_log_vars
    trainable = (params, init_log_vars(tuple(LOSS_WEIGHTS)))
  else:
    trainable = params
  opt_state = tx.init(trainable)
  np_rng = np.random.default_rng(seed)
  usable = np.nonzero(np.asarray(wp_valid).any(-1))[0]
  n_val = int(len(usable) * val_fraction)
  val_idx = usable[len(usable) - n_val:] if n_val else None
  usable = usable[:len(usable) - n_val] if n_val else usable
  history = []
  for i in range(steps):
    f_idx = jnp.asarray(np_rng.choice(usable, size=frames_per_step),
                        jnp.int32)
    rng, sub = jax.random.split(rng)
    trainable, opt_state, aux = step_fn(trainable, opt_state, f_idx, sub,
                                        maps, scene, frames)
    if i % log_every == 0 or i == steps - 1:
      history.append({k: float(v) for k, v in aux.items()})
  params = trainable[0] if learn_loss_weights else trainable
  if val_idx is not None and len(val_idx) and history:
    sums, n = {}, 0
    for j in range(0, min(len(val_idx), 8), 2):
      rng, sub = jax.random.split(rng)
      aux = eval_fn(params, jnp.asarray(val_idx[j:j + 2], jnp.int32), sub,
                    maps, scene, frames)
      for k, v in aux.items():
        # non-scalar diagnostics (e.g. the [4,4] speed-class confusion
        # matrix) are accumulated by offline_diagnosis, not here
        if hasattr(v, "ndim") and v.ndim != 0:
          continue
        sums[k] = sums.get(k, 0.0) + float(v)
      n += 1
    history[-1].update(
        {f"val_{k}": v / max(n, 1) for k, v in sums.items()})
  return model, params, history
