"""PlanT imitation-learning training — fully on-device pipeline.

Replaces the reference's train.py (torchrun + DDP/NCCL + disk DataLoader,
train.py:351-377, :643-996) for the PlanT model: training data comes
straight from batched expert rollouts (sim/datagen.py) as device arrays;
the train step is jitted with batch sharding over a device mesh (DP via
pjit — the ZeRO/DDP analog is XLA's sharding propagation + psum).

Sample layout mirrors the reference exactly (plant.py forward +
plant_agent.py:142 padding): object boxes = nearest vehicles / walkers /
red-yellow lights / stop signs in the ego frame, zero-padded (type 0) to
max_objects; route tokens = num_route_points points of the dense route at
2 m spacing; hazard flags from the expert; forecast labels = quantized
future attributes 0.5 s ahead (data.py:1017-1051 quantization).

Losses follow plant.py:311-342: L1 waypoints + class-weighted CE target
speed + checkpoint L1 + mean CE over the 7 forecast attribute heads with
ignore-index for padded/despawned objects.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.models.plant import ObjType, PlanT, PlanTConfig
from carla_garage_tpu.ops.losses import cross_entropy
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.sim.datagen import (Frames, PRED_LEN,
                                          checkpoint_labels,
                                          target_speed_labels,
                                          waypoint_labels)
from carla_garage_tpu.structs import LightState, Scene

IGNORE_INDEX = -999
FORECAST_FRAMES = 2       # 0.5 s at 4 Hz (config.py:544 forcast_time)


@dataclasses.dataclass
class PlantDataset:
  """Flattened [N,...] numpy training arrays."""
  boxes: np.ndarray          # [N,O,7]
  box_types: np.ndarray      # [N,O] int32
  route: np.ndarray          # [N,R,2]
  light: np.ndarray          # [N]
  stop: np.ndarray           # [N]
  junction: np.ndarray       # [N]
  velocity: np.ndarray       # [N]
  target_point: np.ndarray   # [N,2] (PID-side, not a net input)
  wp_label: np.ndarray       # [N,pred_len,2]
  speed_label: np.ndarray    # [N]
  ckpt_label: np.ndarray     # [N,R,2]
  forecast_label: np.ndarray  # [N,O,7] int32 (IGNORE_INDEX = no label)
  # per-sample waypoint-loss weight (None = all ones). DAgger frames carry
  # 0: their recorded trajectory is the POLICY's own, so the future-ego
  # waypoint label is wrong at exactly the mistake states DAgger exists to
  # correct; the route-relative labels (speed class, checkpoint, forecast)
  # stay valid (datagen.collect_dagger_frames docstring).
  wp_weight: np.ndarray | None = None

  def __len__(self):
    return len(self.boxes)


BATCH_KEYS = ("boxes", "box_types", "route", "light", "stop", "junction",
              "velocity", "target_point", "wp_label", "speed_label",
              "ckpt_label", "forecast_label", "wp_weight")


def quantize_attrs(cfg: GlobalConfig, pcfg: PlanTConfig,
                   attrs: jnp.ndarray) -> jnp.ndarray:
  """data.py:1017-1051 quantize_box over [...,7] attrs -> int bins."""
  sc = cfg.sensor
  x = (attrs[..., 0] + sc.max_x) / (sc.max_x - sc.min_x)
  y = (attrs[..., 1] + sc.max_y) / (sc.max_y - sc.min_y)
  ex = attrs[..., 2] / 30.0
  ey = attrs[..., 3] / 30.0
  yaw = (attrs[..., 4] + jnp.pi) / (2 * jnp.pi)
  speed = attrs[..., 5] / (60.0 / 3.6)     # plant_max_speed_pred km/h->m/s
  brake = attrs[..., 6]
  norm = jnp.stack([x, y, ex, ey, yaw, speed, brake], -1)
  norm = jnp.clip(norm, 0.0, 1.0)
  sizes = jnp.array(pcfg.vocab_sizes, jnp.float32)
  return jnp.round(norm * (sizes - 1)).astype(jnp.int32)


def _object_candidates(cfg: GlobalConfig, frames: Frames, scene: Scene):
  """All candidate object tokens per frame: vehicles, walkers, affecting
  lights, stop signs — ego-frame attrs [F,B,C,7], types, valid, distance.
  Also returns future attrs (0.5 s ahead) for vehicles/walkers and a
  forecast-validity mask."""
  F, B = frames.ego_yaw.shape
  ego_pos, ego_yaw = frames.ego_pos, frames.ego_yaw

  def rel_attrs(pos, yaw, extent, speed, brake, ref_pos, ref_yaw):
    rel = geo.world_to_ego(pos, ref_pos[:, :, None], ref_yaw[:, :, None])
    ryaw = geo.normalize_angle(yaw - ref_yaw[:, :, None])
    return jnp.stack([rel[..., 0], rel[..., 1], extent[..., 0],
                      extent[..., 1], ryaw, speed, brake], -1)

  def shift2(x):
    return jnp.roll(x, -FORECAST_FRAMES, axis=0)

  v_attr = rel_attrs(frames.veh_pos, frames.veh_yaw, frames.veh_extent,
                     frames.veh_speed, frames.veh_brake, ego_pos, ego_yaw)
  v_fut = rel_attrs(shift2(frames.veh_pos), shift2(frames.veh_yaw),
                    frames.veh_extent, shift2(frames.veh_speed),
                    shift2(frames.veh_brake), ego_pos, ego_yaw)
  v_fc_ok = frames.veh_valid & shift2(frames.veh_valid)
  w_attr = rel_attrs(frames.wlk_pos, frames.wlk_yaw, frames.wlk_extent,
                     frames.wlk_speed, jnp.zeros_like(frames.wlk_speed),
                     ego_pos, ego_yaw)
  w_fut = rel_attrs(shift2(frames.wlk_pos), shift2(frames.wlk_yaw),
                    frames.wlk_extent, shift2(frames.wlk_speed),
                    jnp.zeros_like(frames.wlk_speed), ego_pos, ego_yaw)
  w_fc_ok = frames.wlk_valid & shift2(frames.wlk_valid)

  # lights: red/yellow at the frame time (the reference's GT light boxes)
  lights = scene.lights
  lstate = lights.state_at(frames.time_s)                 # [F,B,L]
  l_red = (lstate == LightState.RED) | (lstate == LightState.YELLOW)
  l_attr = rel_attrs(
      jnp.broadcast_to(lights.pos[None], (F,) + lights.pos.shape),
      jnp.broadcast_to(lights.yaw[None], (F,) + lights.yaw.shape),
      jnp.broadcast_to(lights.extent[None], (F,) + lights.extent.shape),
      jnp.zeros_like(l_red, jnp.float32), jnp.zeros_like(l_red, jnp.float32),
      ego_pos, ego_yaw)
  l_ok = jnp.broadcast_to(lights.valid[None], l_red.shape) & l_red
  stops = scene.stops
  s_attr = rel_attrs(
      jnp.broadcast_to(stops.pos[None], (F,) + stops.pos.shape),
      jnp.broadcast_to(stops.yaw[None], (F,) + stops.yaw.shape),
      jnp.broadcast_to(stops.extent[None], (F,) + stops.extent.shape),
      jnp.zeros((F,) + stops.yaw.shape), jnp.zeros((F,) + stops.yaw.shape),
      ego_pos, ego_yaw)
  s_ok = jnp.broadcast_to(stops.valid[None], s_attr.shape[:-1])

  attrs = jnp.concatenate([v_attr, w_attr, l_attr, s_attr], 2)
  fut = jnp.concatenate([
      v_fut, w_fut, jnp.zeros_like(l_attr), jnp.zeros_like(s_attr)], 2)
  V, W = frames.veh_yaw.shape[-1], frames.wlk_yaw.shape[-1]
  L, S = lights.yaw.shape[-1], stops.yaw.shape[-1]
  types = jnp.concatenate([
      jnp.full((F, B, V), ObjType.VEHICLE, jnp.int32),
      jnp.full((F, B, W), ObjType.WALKER, jnp.int32),
      jnp.full((F, B, L), ObjType.LIGHT, jnp.int32),
      jnp.full((F, B, S), ObjType.STOP, jnp.int32)], 2)
  valid = jnp.concatenate([
      frames.veh_valid, frames.wlk_valid, l_ok, s_ok], 2)
  fc_ok = jnp.concatenate([
      v_fc_ok, w_fc_ok, jnp.zeros_like(l_ok), jnp.zeros_like(s_ok)], 2)
  d = jnp.linalg.norm(attrs[..., :2], axis=-1)
  valid &= d < 32.0                       # the PlanT observation range
  return attrs, fut, types, valid, fc_ok, d


def build_plant_samples(cfg: GlobalConfig, pcfg: PlanTConfig,
                        frames: Frames, scene: Scene):
  """Frames [F,B,...] -> per-frame model inputs + labels (jnp, [F,B,...])."""
  F, B = frames.ego_yaw.shape
  O = pcfg.max_objects
  attrs, fut, types, valid, fc_ok, d = _object_candidates(cfg, frames,
                                                          scene)
  # nearest-first selection into O slots; padding = zeros w/ type 0
  # (plant_agent.py:142 zero-pads, type column 0)
  order = jnp.argsort(jnp.where(valid, d, jnp.inf), axis=-1)[..., :O]

  def g(x):
    if x.ndim == 4:                       # [F,B,C,k]
      return jnp.take_along_axis(x, order[..., None], 2)
    return jnp.take_along_axis(x, order, 2)
  sel_attr = g(attrs)
  sel_fut = g(fut)
  sel_types = g(types)
  sel_valid = g(valid)
  sel_fc = g(fc_ok) & sel_valid
  boxes = jnp.where(sel_valid[..., None], sel_attr, 0.0)
  box_types = jnp.where(sel_valid, sel_types, ObjType.VEHICLE)
  forecast = jnp.where(sel_fc[..., None],
                       quantize_attrs(cfg, pcfg, sel_fut), IGNORE_INDEX)

  # route tokens: num_route_points dense-route points at 2 m spacing
  R = scene.route.points.shape[1]
  offs = jnp.arange(pcfg.num_route_points) * 2
  q = jnp.clip(frames.dense_idx[..., None] + offs, 0, R - 1)
  pts = jnp.take_along_axis(
      jnp.broadcast_to(scene.route.points[None], (F, B, R, 2)),
      q[..., None], 2)
  route = geo.world_to_ego(pts, frames.ego_pos[:, :, None],
                           frames.ego_yaw[:, :, None])
  return dict(boxes=boxes, box_types=box_types, route=route,
              light=frames.light_hazard, stop=frames.stop_hazard,
              junction=frames.junction.astype(jnp.float32),
              velocity=frames.ego_speed, forecast_label=forecast)


def build_plant_dataset(cfg: GlobalConfig, pcfg: PlanTConfig,
                        frames: Frames, scene: Scene) -> PlantDataset:
  """Frames [F,B,...] -> flattened valid samples."""
  s = build_plant_samples(cfg, pcfg, frames, scene)
  wp, wp_valid = waypoint_labels(frames)
  speed_cls = target_speed_labels(frames, cfg, brake_lookahead=2)
  ckpt = checkpoint_labels(frames, scene, pcfg.num_route_points)
  sample_valid = np.asarray(wp_valid).reshape(-1)

  def flat(x):
    x = np.asarray(x)
    return x.reshape((-1,) + x.shape[2:])[sample_valid]

  return PlantDataset(
      boxes=flat(s["boxes"]), box_types=flat(s["box_types"]),
      route=flat(s["route"]), light=flat(s["light"]), stop=flat(s["stop"]),
      junction=flat(s["junction"]), velocity=flat(s["velocity"]),
      target_point=flat(frames.target_point), wp_label=flat(wp),
      speed_label=flat(speed_cls), ckpt_label=flat(ckpt),
      forecast_label=flat(s["forecast_label"]))


# Target-speed class weights (config.py:158)
SPEED_WEIGHTS = (0.866605263873406, 7.4527377240841775, 1.2281629310898465,
                 0.5269622904065803)


def _apply(model, params, batch):
  return model.apply(params, batch["boxes"], batch["box_types"],
                     batch["route"], batch["light"], batch["stop"],
                     batch["junction"], batch["velocity"])


def plant_loss(model: PlanT, params, batch, rng=None, log_vars=None):
  """log_vars (optional dict of per-task log-variances) switches the fixed
  unit weights to Kendall learned multi-task weighting
  (train.py:384-456 learn_multi_task_weights)."""
  out = _apply(model, params, batch)
  wp_err = jnp.mean(jnp.abs(out["pred_wp"] - batch["wp_label"]), (1, 2))
  ww = batch.get("wp_weight")
  wp_loss = jnp.mean(wp_err) if ww is None else \
      jnp.sum(wp_err * ww) / jnp.maximum(jnp.sum(ww), 1.0)
  losses = {
      "wp": wp_loss,
      "speed": cross_entropy(out["pred_target_speed"], batch["speed_label"],
                             weights=SPEED_WEIGHTS, label_smoothing=0.1),
      "ckpt": jnp.mean(jnp.abs(out["pred_checkpoint"] -
                               batch["ckpt_label"])),
  }
  # forecast: mean CE over the 7 attribute heads, ignoring unlabeled
  # objects (plant.py:328-341, ignore_index)
  fc_total = 0.0
  for i, logits in enumerate(out["pred_forecast"]):
    lab = batch["forecast_label"][..., i]
    ok = lab != IGNORE_INDEX
    lab_safe = jnp.clip(lab, 0, logits.shape[-1] - 1)
    ce = -jnp.take_along_axis(jax.nn.log_softmax(logits),
                              lab_safe[..., None], -1)[..., 0]
    fc_total += jnp.sum(jnp.where(ok, ce, 0.0)) / \
        jnp.maximum(jnp.sum(ok), 1.0)
  losses["forecast"] = fc_total / len(out["pred_forecast"])
  if log_vars is not None:
    from carla_garage_tpu.train.schedules import uncertainty_weighted_total
    loss = uncertainty_weighted_total(losses, log_vars)
  else:
    loss = sum(losses.values())
  aux = {f"loss_{k}": v for k, v in losses.items()}
  aux["loss"] = loss
  return loss, aux


def make_train_step(model: PlanT, tx, learn_loss_weights: bool = False):
  """Jitted SGD step. With learn_loss_weights the trainable pytree is
  (params, log_vars) and the loss is Kendall-weighted."""
  if not learn_loss_weights:
    @jax.jit
    def train_step(params, opt_state, batch):
      (loss, aux), grads = jax.value_and_grad(
          lambda p: plant_loss(model, p, batch), has_aux=True)(params)
      updates, opt_state = tx.update(grads, opt_state, params)
      params = optax.apply_updates(params, updates)
      return params, opt_state, aux
    return train_step

  @jax.jit
  def train_step_kendall(trainable, opt_state, batch):
    (loss, aux), grads = jax.value_and_grad(
        lambda t: plant_loss(model, t[0], batch, log_vars=t[1]),
        has_aux=True)(trainable)
    updates, opt_state = tx.update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    return trainable, opt_state, aux
  return train_step_kendall


def iterate_minibatches(ds: PlantDataset, batch_size: int,
                        rng: np.random.Generator,
                        epochs: int = 1,
                        velocity_dropout: float = 0.0) -> Iterator[dict]:
  """velocity_dropout zeroes the measured speed for that fraction of
  samples — without it the model learns the 'speed==0 => brake' shortcut
  (the velocity bias the reference paper analyzes; closed-loop launches
  from standstill then never happen)."""
  n = len(ds)
  for _ in range(epochs):
    order = rng.permutation(n)
    for i in range(0, n - batch_size + 1, batch_size):
      sel = order[i:i + batch_size]
      batch = {k: getattr(ds, k)[sel] for k in BATCH_KEYS
               if getattr(ds, k) is not None}
      if velocity_dropout > 0:
        drop = rng.random(batch_size) < velocity_dropout
        batch["velocity"] = np.where(drop, 0.0, batch["velocity"])
      yield batch


def relabel_with_plant(model: PlanT, params, ds: PlantDataset,
                       batch_size: int = 256) -> PlantDataset:
  """Replace the expert labels with PlanT predictions — the LbC-style
  offline relabeling of team_code/relabel_dataset.py (used with
  use_plant_labels, config.py:265)."""
  n = (len(ds) // batch_size) * batch_size
  apply = jax.jit(lambda b: _apply(model, params, b))
  wp = np.array(ds.wp_label)
  sp = np.array(ds.speed_label)
  for i in range(0, n, batch_size):
    sl = slice(i, i + batch_size)
    out = apply({k: getattr(ds, k)[sl] for k in BATCH_KEYS
                 if getattr(ds, k) is not None})
    wp[sl] = np.asarray(out["pred_wp"])[:, :wp.shape[1]]
    sp[sl] = np.asarray(jnp.argmax(out["pred_target_speed"], -1))
  return dataclasses.replace(ds, wp_label=wp, speed_label=sp)


def estimate_speed_weights(ds: PlantDataset):
  """Inverse-frequency target-speed class weights from the dataset
  (estimate_class_distributions, config.py:154 / train.py)."""
  counts = np.bincount(ds.speed_label, minlength=4).astype(np.float64)
  counts = np.maximum(counts, 1.0)
  w = len(ds) / (4.0 * counts)
  return tuple(w.tolist())


def make_schedule(schedule: str | None, lr: float, steps: int):
  """LR schedule wiring (train.py:588-598): 'multistep' decays 0.1× at the
  reference's 30/40-of-47-epoch milestones mapped to step fractions
  (0.64/0.85); 'cosine_restart' is SGDR t0=1, t_mult=2; None = constant."""
  from carla_garage_tpu.train import schedules
  if schedule == "multistep":
    return schedules.multistep_schedule(
        lr, steps_per_epoch=1,
        milestones=(max(int(0.64 * steps), 1), max(int(0.85 * steps), 2)))
  if schedule == "cosine_restart":
    return schedules.cosine_restart_schedule(
        lr, steps_per_epoch=max(steps // 127, 1))
  return lr


def _split_dataset(ds: PlantDataset, val_fraction: float):
  n_val = int(len(ds) * val_fraction)
  if n_val == 0:
    return ds, None
  sl_t, sl_v = slice(0, len(ds) - n_val), slice(len(ds) - n_val, len(ds))
  f = dataclasses.fields(PlantDataset)

  def take(sl):
    return PlantDataset(**{
        x.name: (getattr(ds, x.name)[sl]
                 if getattr(ds, x.name) is not None else None)
        for x in f})
  return take(sl_t), take(sl_v)


def train_plant(cfg: GlobalConfig, pcfg: PlanTConfig, ds: PlantDataset,
                steps: int = 500, batch_size: int = 64, lr: float = 3e-4,
                seed: int = 0, params=None, log_every: int = 100,
                estimate_weights: bool = False,
                schedule: str | None = "multistep",
                learn_loss_weights: bool = False,
                val_fraction: float = 0.1):
  """Training loop (train.py:643-996 analog): LR schedule, optional Kendall
  loss weighting, held-out validation losses (train.py:822-843)."""
  global SPEED_WEIGHTS
  if estimate_weights:
    SPEED_WEIGHTS = estimate_speed_weights(ds)
  model = PlanT(pcfg)
  rng = np.random.default_rng(seed)
  train_ds, val_ds = _split_dataset(ds, val_fraction)
  if params is None:
    ex = next(iterate_minibatches(train_ds, min(batch_size, len(train_ds)),
                                  rng))
    params = model.init(jax.random.key(seed), ex["boxes"], ex["box_types"],
                        ex["route"], ex["light"], ex["stop"],
                        ex["junction"], ex["velocity"])
  tx = optax.adamw(make_schedule(schedule, lr, steps), weight_decay=0.01)
  step_fn = make_train_step(model, tx, learn_loss_weights)
  if learn_loss_weights:
    from carla_garage_tpu.train.schedules import init_log_vars
    trainable = (params, init_log_vars(("wp", "speed", "ckpt", "forecast")))
  else:
    trainable = params
  opt_state = tx.init(trainable)
  it = iterate_minibatches(train_ds, batch_size, rng, epochs=10_000,
                           velocity_dropout=0.15)
  history = []
  for i in range(steps):
    batch = next(it)
    trainable, opt_state, aux = step_fn(trainable, opt_state, batch)
    if i % log_every == 0 or i == steps - 1:
      history.append({k: float(v) for k, v in aux.items()})
  params = trainable[0] if learn_loss_weights else trainable
  if val_ds is not None and len(val_ds) and history:
    history[-1].update(validate_plant(model, params, val_ds, batch_size))
  return model, params, history


def validate_plant(model: PlanT, params, val_ds: PlantDataset,
                   batch_size: int = 64) -> dict:
  """Validation losses over the held-out split (train.py:822-843)."""
  loss_fn = jax.jit(lambda p, b: plant_loss(model, p, b)[1])
  rng = np.random.default_rng(0)
  sums, n = {}, 0
  for batch in iterate_minibatches(val_ds, min(batch_size, len(val_ds)),
                                   rng):
    aux = loss_fn(params, batch)
    for k, v in aux.items():
      sums[k] = sums.get(k, 0.0) + float(v)
    n += 1
  return {f"val_{k}": v / max(n, 1) for k, v in sums.items()}
