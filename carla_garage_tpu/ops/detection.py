"""CenterNet target generation, decode, and NMS — vectorized.

Re-designs of the reference's MMDet-derived utilities:
  gaussian_radius / gen_gaussian_target   gaussian_target.py
  get_local_maximum / get_topk_from_heatmap  center_net.py:172-237
  CenterNet target splatting              data.py:698-791
  ensemble NMS (shapely IoU)              transfuser_utils.py:409-451

All fixed-shape: targets splat over the full grid with per-box masks; NMS is
a greedy O(K^2) mask loop over the top-K decoded boxes (K=100) using
rotated-IoU approximated via corner-sampled overlap of axis-projected boxes
(exact SAT intersection test × area sampling is unnecessary for the 0.2
suppression threshold used at inference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from carla_garage_tpu.sim import geometry as geo


def gaussian_radius(height, width, min_overlap=0.1):
  """Radius of the gaussian splat so IoU with the GT box stays above
  min_overlap (gaussian_target.py, three quadratic cases, take min)."""
  a1 = 1.0
  b1 = height + width
  c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
  sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))
  r1 = (b1 - sq1) / (2 * a1)
  a2 = 4.0
  b2 = 2 * (height + width)
  c2 = (1 - min_overlap) * width * height
  sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))
  r2 = (b2 - sq2) / (2 * a2)
  a3 = 4 * min_overlap
  b3 = -2 * min_overlap * (height + width)
  c3 = (min_overlap - 1) * width * height
  sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
  r3 = (b3 + sq3) / (2 * a3)
  return jnp.minimum(jnp.minimum(r1, r2), r3)


def splat_gaussian_heatmap(h: int, w: int, centers: jnp.ndarray,
                           radii: jnp.ndarray, valid: jnp.ndarray,
                           cls: jnp.ndarray, num_classes: int) -> jnp.ndarray:
  """Max-composite gaussian targets [h,w,num_classes].

  centers [K,2] (x=col, y=row float), radii [K], valid [K], cls [K].

  The gaussian is centered at floor(center) — the integer peak pixel — so
  the peak value is exactly 1.0, matching the reference (data.py
  get_targets splats at ctx_int/cty_int with the fractional part carried
  by the offset head) and the `target == 1` positive keying of
  gaussian_focal_loss. Splatting at the float center leaves no pixel at
  1.0 and trains the heatmap toward all-zero (round-1 advisor finding)."""
  ys = jnp.arange(h, dtype=jnp.float32)[:, None]
  xs = jnp.arange(w, dtype=jnp.float32)[None, :]

  def one(center, radius, ok, c):
    center = jnp.floor(center)
    sigma = jnp.maximum((2 * radius + 1) / 6.0, 1e-3)
    g = jnp.exp(-((xs - center[0]) ** 2 + (ys - center[1]) ** 2)
                / (2 * sigma ** 2))
    g = jnp.where(ok, g, 0.0)
    return g[..., None] * jax.nn.one_hot(c, num_classes)

  maps = jax.vmap(one)(centers, radii, valid, cls)      # [K,h,w,C]
  return jnp.max(maps, axis=0)


def gaussian_focal_loss(pred_sigmoid, target, alpha=2.0, gamma=4.0):
  """CornerNet-style focal loss on gaussian heatmaps
  (transfuser_utils.py:341, mmdet gaussian_focal_loss)."""
  eps = 1e-12
  pos_w = (target >= 1.0 - 1e-4).astype(jnp.float32)
  neg_w = jnp.power(1 - target, gamma)
  pos = -jnp.log(pred_sigmoid + eps) * jnp.power(
      1 - pred_sigmoid, alpha) * pos_w
  neg = -jnp.log(1 - pred_sigmoid + eps) * jnp.power(
      pred_sigmoid, alpha) * neg_w * (1 - pos_w)
  return pos + neg


def local_maximum(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
  """NMS-pool: keep only local maxima (center_net.get_local_maximum)."""
  pad = kernel // 2
  pooled = jax.lax.reduce_window(
      heat, -jnp.inf, jax.lax.max, (1, kernel, kernel, 1), (1, 1, 1, 1),
      [(0, 0), (pad, pad), (pad, pad), (0, 0)])
  return jnp.where(pooled == heat, heat, 0.0)


def topk_decode(preds: dict, *, ppm: float, k: int = 100,
                min_x: float = -32.0, min_y: float = -32.0,
                num_dir_bins: int = 12):
  """Top-k boxes from CenterNet outputs (center_net.py:172-237 +
  model.convert_features_to_bb_metric :447-459).

  preds: dict of [B,h,w,*] feature maps (raw logits). Returns dict of
  [B,k] arrays: x, y (meters, ego frame), w, l, yaw, velocity, brake,
  score, cls.

  ppm (required, keyword-only): grid cells per meter of the DETECTION
  feature grid — e.g. a 256-px / 64-m BEV at model stride 8 is a 32×32
  grid = 0.5 cells/m. Derive it from the model config (see
  `grid_ppm` on the agent side); a wrong value scales every decoded
  position and size.
  """
  heat = local_maximum(jax.nn.sigmoid(preds["heatmap"]))
  B, h, w, C = heat.shape
  flat = heat.reshape(B, -1)
  score, idx = jax.lax.top_k(flat, k)
  cls = idx % C
  pix = idx // C
  py = (pix // w).astype(jnp.float32)
  px = (pix % w).astype(jnp.float32)

  def gather(m):
    return jnp.take_along_axis(m.reshape(B, h * w, -1),
                               (idx // C)[..., None], axis=1)

  off = gather(preds["offset"])
  wh = gather(preds["wh"])
  yaw_cls = jnp.argmax(gather(preds["yaw_class"]), -1)
  yaw_res = gather(preds["yaw_res"])[..., 0]
  # velocity/brake branches are absent on pretrained drop-ins
  # (center_net.py:67-72 builds them only for temporal configs)
  if "velocity" in preds:
    vel = gather(preds["velocity"])[..., 0]
  else:
    vel = jnp.zeros_like(yaw_res)
  if "brake" in preds:
    brake = jnp.argmax(gather(preds["brake"]), -1)
  else:
    brake = jnp.zeros_like(yaw_cls)
  cx = px + off[..., 0]
  cy = py + off[..., 1]
  angle_per_class = 2 * jnp.pi / num_dir_bins
  yaw = yaw_cls * angle_per_class + yaw_res
  yaw = geo.normalize_angle(yaw)
  return {
      "x": cx / ppm + min_x, "y": cy / ppm + min_y,
      "w": wh[..., 0] / ppm, "l": wh[..., 1] / ppm,
      "yaw": yaw, "velocity": vel, "brake": brake,
      "score": score, "cls": cls,
  }


def rotated_iou_approx(c1, y1, e1, c2, y2, e2, n_samples: int = 8):
  """Approximate rotated-box IoU by area-sampling box 1 inside box 2.

  Good enough for the NMS threshold 0.2 (transfuser_utils.py:409-451 uses
  shapely polygons — host-only; this stays on device)."""
  # sample a grid of points inside box1, count how many fall in box2
  lin = (jnp.arange(n_samples) + 0.5) / n_samples * 2.0 - 1.0
  gx, gy = jnp.meshgrid(lin, lin)
  local = jnp.stack([gx, gy], -1).reshape(-1, 2)          # [S,2] in [-1,1]
  pts = geo.ego_to_world(local * e1[..., None, :], c1[..., None, :],
                         y1[..., None])
  inside = geo.point_in_obb(pts, c2[..., None, :], y2[..., None],
                            e2[..., None, :])
  inter_frac = jnp.mean(inside.astype(jnp.float32), -1)
  a1 = 4 * e1[..., 0] * e1[..., 1]
  a2 = 4 * e2[..., 0] * e2[..., 1]
  inter = inter_frac * a1
  return inter / jnp.maximum(a1 + a2 - inter, 1e-6)


def nms_rotated(boxes: dict, iou_threshold: float = 0.2,
                score_threshold: float = 0.3):
  """Greedy rotated NMS over decoded boxes [B,K] -> keep mask [B,K]."""
  c = jnp.stack([boxes["x"], boxes["y"]], -1)             # [B,K,2]
  e = jnp.stack([boxes["l"], boxes["w"]], -1) / 2.0
  yaw = boxes["yaw"]
  score = boxes["score"]
  K = score.shape[-1]
  iou = rotated_iou_approx(c[:, :, None], yaw[:, :, None], e[:, :, None],
                           c[:, None], yaw[:, None], e[:, None])   # [B,K,K]
  # The sampled IoU is asymmetric (box i's area sampled against box j);
  # symmetrize so a low-scoring survivor can never suppress a
  # higher-scoring kept box that its own row under-measured.
  iou = jnp.maximum(iou, jnp.swapaxes(iou, -1, -2))
  order = jnp.argsort(-score, axis=-1)

  def body(i, keep):
    # suppress all boxes with high IoU to the i-th highest-scoring kept box
    bi = order[:, i]
    is_kept = jnp.take_along_axis(keep, bi[:, None], 1)[:, 0]
    row = jnp.take_along_axis(iou, bi[:, None, None], 1)[:, 0]     # [B,K]
    suppress = (row > iou_threshold) & is_kept[:, None]
    suppress = suppress.at[jnp.arange(score.shape[0]), bi].set(False)
    return keep & ~suppress

  keep = score > score_threshold
  keep = jax.lax.fori_loop(0, K, body, keep)
  return keep
