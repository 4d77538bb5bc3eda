"""PlanT imitation-learning training — fully on-device pipeline.

Replaces the reference's train.py (torchrun + DDP/NCCL + disk DataLoader,
train.py:351-377, :643-996) for the PlanT model: training data comes
straight from batched expert rollouts (sim/datagen.py) as device arrays;
the train step is jitted with batch sharding over a device mesh (DP via
pjit — the ZeRO/DDP analog is XLA's sharding propagation + psum).

Losses follow plant.py:311-342 / train.py loss weighting: L1 waypoints +
class-weighted CE target speed (+ checkpoint L1 when used).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from carla_garage_tpu.config import GlobalConfig
from carla_garage_tpu.models.plant import PlanT, PlanTConfig
from carla_garage_tpu.ops.losses import cross_entropy
from carla_garage_tpu.sim import geometry as geo
from carla_garage_tpu.sim.datagen import (Frames, PRED_LEN,
                                          checkpoint_labels,
                                          target_speed_labels,
                                          waypoint_labels)
from carla_garage_tpu.structs import Scene


@dataclasses.dataclass
class PlantDataset:
  """Flattened [N,...] numpy training arrays."""
  tokens: np.ndarray
  types: np.ndarray
  token_valid: np.ndarray
  target_point: np.ndarray
  wp_label: np.ndarray
  speed_label: np.ndarray
  ckpt_label: np.ndarray

  def __len__(self):
    return len(self.tokens)


def build_plant_dataset(cfg: GlobalConfig, pcfg: PlanTConfig,
                        frames: Frames, scene: Scene) -> PlantDataset:
  """Frames [F,B,...] -> flattened valid samples.

  Token construction mirrors agents.plant_agent.extract_tokens but over the
  recorded world snapshots.
  """
  F, B = frames.ego_yaw.shape
  V = frames.veh_yaw.shape[-1]
  W = frames.wlk_yaw.shape[-1]
  ego_pos = frames.ego_pos
  ego_yaw = frames.ego_yaw

  def obj_tokens(pos, yaw, extent, speed, brake, valid):
    rel = geo.world_to_ego(pos, ego_pos[:, :, None], ego_yaw[:, :, None])
    ryaw = geo.normalize_angle(yaw - ego_yaw[:, :, None])
    d = jnp.linalg.norm(rel, axis=-1)
    ok = valid & (d < cfg.expert.detection_radius)
    attrs = jnp.stack([rel[..., 0], rel[..., 1], extent[..., 0],
                       extent[..., 1], ryaw, speed, brake], -1)
    return jnp.where(ok[..., None], attrs, 0.0), ok

  v_tok, v_ok = obj_tokens(frames.veh_pos, frames.veh_yaw, frames.veh_extent,
                           frames.veh_speed, frames.veh_brake,
                           frames.veh_valid)
  w_tok, w_ok = obj_tokens(frames.wlk_pos, frames.wlk_yaw, frames.wlk_extent,
                           frames.wlk_speed,
                           jnp.zeros_like(frames.wlk_speed),
                           frames.wlk_valid)

  n_seg = pcfg.max_tokens - V - W
  n_pts = 2 * n_seg
  offs = jnp.arange(n_pts) * 2
  q = frames.dense_idx[..., None] + offs                     # [F,B,n]
  R = scene.route.points.shape[1]
  qc = jnp.clip(q, 0, R - 1)
  pts = jnp.take_along_axis(
      jnp.broadcast_to(scene.route.points[None], (F, B, R, 2)),
      qc[..., None], 2)
  rel_pts = geo.world_to_ego(pts, ego_pos[:, :, None], ego_yaw[:, :, None])
  p0 = rel_pts[:, :, 0::2][:, :, :n_seg]
  p1 = rel_pts[:, :, 1::2][:, :, :n_seg]
  mid = (p0 + p1) / 2.0
  d = p1 - p0
  seg_yaw = jnp.arctan2(d[..., 1], d[..., 0])
  seg_len = jnp.linalg.norm(d, axis=-1)
  in_route = (q[:, :, 1::2][:, :, :n_seg] <
              scene.route.num_valid[None, :, None])
  r_tok = jnp.stack([mid[..., 0], mid[..., 1], seg_len / 2.0,
                     jnp.ones_like(seg_len), seg_yaw,
                     jnp.zeros_like(seg_len), jnp.zeros_like(seg_len)], -1)
  r_tok = jnp.where(in_route[..., None], r_tok, 0.0)

  tokens = jnp.concatenate([v_tok, w_tok, r_tok], 2)         # [F,B,T,A]
  types = jnp.concatenate([
      jnp.full((F, B, V), 0, jnp.int32), jnp.full((F, B, W), 1, jnp.int32),
      jnp.full((F, B, n_seg), 4, jnp.int32)], 2)
  token_valid = jnp.concatenate([v_ok, w_ok, in_route], 2)

  wp, wp_valid = waypoint_labels(frames)
  speed_cls = target_speed_labels(frames, cfg, brake_lookahead=2)
  ckpt = checkpoint_labels(frames, scene, pcfg.checkpoint_len)
  sample_valid = np.asarray(wp_valid).reshape(-1)

  def flat(x):
    return np.asarray(x).reshape((-1,) + x.shape[2:])[sample_valid]

  return PlantDataset(
      tokens=flat(tokens), types=flat(types), token_valid=flat(token_valid),
      target_point=flat(frames.target_point), wp_label=flat(wp),
      speed_label=flat(speed_cls), ckpt_label=flat(ckpt))


# Target-speed class weights (config.py:158)
SPEED_WEIGHTS = (0.866605263873406, 7.4527377240841775, 1.2281629310898465,
                 0.5269622904065803)


def plant_loss(model: PlanT, params, batch, rng=None, log_vars=None):
  """log_vars (optional dict of per-task log-variances) switches the fixed
  unit weights to Kendall learned multi-task weighting
  (train.py:384-456 learn_multi_task_weights)."""
  out = model.apply(params, batch["tokens"], batch["types"],
                    batch["token_valid"], batch["target_point"])
  losses = {
      "wp": jnp.mean(jnp.abs(out["pred_wp"] - batch["wp_label"])),
      "speed": cross_entropy(out["pred_target_speed"], batch["speed_label"],
                             weights=SPEED_WEIGHTS, label_smoothing=0.1),
      "ckpt": jnp.mean(jnp.abs(out["pred_checkpoint"] -
                               batch["ckpt_label"])),
  }
  if log_vars is not None:
    from carla_garage_tpu.train.schedules import uncertainty_weighted_total
    loss = uncertainty_weighted_total(losses, log_vars)
  else:
    loss = sum(losses.values())
  return loss, {"loss": loss, "loss_wp": losses["wp"],
                "loss_speed": losses["speed"], "loss_ckpt": losses["ckpt"]}


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


def iterate_minibatches(ds: PlantDataset, batch_size: int, rng: np.random.Generator,
                        epochs: int = 1) -> Iterator[dict]:
  n = len(ds)
  for _ in range(epochs):
    order = rng.permutation(n)
    for i in range(0, n - batch_size + 1, batch_size):
      sel = order[i:i + batch_size]
      yield {
          "tokens": ds.tokens[sel], "types": ds.types[sel],
          "token_valid": ds.token_valid[sel],
          "target_point": ds.target_point[sel],
          "wp_label": ds.wp_label[sel], "speed_label": ds.speed_label[sel],
          "ckpt_label": ds.ckpt_label[sel],
      }


def relabel_with_plant(model: PlanT, params, ds: PlantDataset,
                       batch_size: int = 256) -> PlantDataset:
  """Replace the expert labels with PlanT predictions — the LbC-style
  offline relabeling of team_code/relabel_dataset.py (used with
  use_plant_labels, config.py:265)."""
  n = (len(ds) // batch_size) * batch_size
  apply = jax.jit(lambda t, ty, v, tp: model.apply(params, t, ty, v, tp))
  wp = np.array(ds.wp_label)
  sp = np.array(ds.speed_label)
  for i in range(0, n, batch_size):
    sl = slice(i, i + batch_size)
    out = apply(ds.tokens[sl], ds.types[sl], ds.token_valid[sl],
                ds.target_point[sl])
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
  train = PlantDataset(**{x.name: getattr(ds, x.name)[sl_t] for x in f})
  val = PlantDataset(**{x.name: getattr(ds, x.name)[sl_v] for x in f})
  return train, val


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
    params = model.init(jax.random.key(seed), ex["tokens"], ex["types"],
                        ex["token_valid"], ex["target_point"])
  tx = optax.adamw(make_schedule(schedule, lr, steps), weight_decay=0.01)
  step_fn = make_train_step(model, tx, learn_loss_weights)
  if learn_loss_weights:
    from carla_garage_tpu.train.schedules import init_log_vars
    trainable = (params, init_log_vars(("wp", "speed", "ckpt")))
  else:
    trainable = params
  opt_state = tx.init(trainable)
  it = iterate_minibatches(train_ds, batch_size, rng, epochs=10_000)
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
