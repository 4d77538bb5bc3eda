"""LiDAR point-cloud voxelization — CARLA_Data.lidar_to_histogram_features.

The reference voxelizes point clouds into a 2-slice 256×256 histogram with at
most 5 points/cell, normalized (data.py:873-906). Device-side equivalent
using scatter-add over fixed-size point buffers with validity masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from carla_garage_tpu.config import GlobalConfig


def voxelize(points: jnp.ndarray, valid: jnp.ndarray,
             cfg: GlobalConfig) -> jnp.ndarray:
  """points [N,3] ego-frame, valid [N] bool -> [2,H,W] float32.

  Slice 0: points below lidar_split_height (above ground), slice 1: above
  (data.py:896-905: 'below' excludes ground unless use_ground_plane).
  Histogram clipped at hist_max_per_pixel then scaled to [0,1].
  """
  sc = cfg.sensor
  H, W = sc.lidar_resolution_height, sc.lidar_resolution_width
  x, y, z = points[:, 0], points[:, 1], points[:, 2]
  cx = ((x - sc.min_x) / (sc.max_x - sc.min_x) * W).astype(jnp.int32)
  cy = ((y - sc.min_y) / (sc.max_y - sc.min_y) * H).astype(jnp.int32)
  inb = valid & (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
  below = z <= sc.lidar_split_height
  flat = jnp.clip(cy, 0, H - 1) * W + jnp.clip(cx, 0, W - 1)

  def hist(mask):
    counts = jnp.zeros((H * W,), jnp.float32).at[flat].add(
        (inb & mask).astype(jnp.float32))
    counts = jnp.minimum(counts, sc.hist_max_per_pixel)
    return (counts / sc.hist_max_per_pixel).reshape(H, W)

  return jnp.stack([hist(below), hist(~below)])


def voxelize_matmul(points: jnp.ndarray, valid: jnp.ndarray,
                    cfg: GlobalConfig) -> jnp.ndarray:
  """Scatter-free voxelization: the 2D histogram as an MXU matmul.

  counts[H,W] = one_hot(cy)^T @ (one_hot(cx) * w) — scatter-add is slow on
  TPU, an outer-product matmul is not. Exactly equals `voxelize` (integer
  counts, clip at hist_max, normalize).
  """
  import jax
  sc = cfg.sensor
  H, W = sc.lidar_resolution_height, sc.lidar_resolution_width
  x, y, z = points[:, 0], points[:, 1], points[:, 2]
  cx = ((x - sc.min_x) / (sc.max_x - sc.min_x) * W).astype(jnp.int32)
  cy = ((y - sc.min_y) / (sc.max_y - sc.min_y) * H).astype(jnp.int32)
  inb = valid & (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
  below = z <= sc.lidar_split_height
  # bf16 one-hots are exact (values 0/1) and the MXU accumulates in fp32,
  # so integer counts stay exact while the matmul runs at full MXU rate
  oy = jax.nn.one_hot(jnp.where(inb, cy, -1), H, dtype=jnp.bfloat16)
  ox = jax.nn.one_hot(jnp.where(inb, cx, -1), W, dtype=jnp.bfloat16)

  def hist(mask):
    counts = jnp.einsum(
        "ph,pw->hw", oy * mask[:, None].astype(jnp.bfloat16), ox,
        preferred_element_type=jnp.float32)
    counts = jnp.minimum(counts, sc.hist_max_per_pixel)
    return counts / sc.hist_max_per_pixel

  return jnp.stack([hist(below), hist(~below)])
