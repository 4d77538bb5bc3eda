"""SimpleBEV-style geometric camera-to-BEV encoder.

Re-design of team_code/bev_encoder.py:15-248: image features from a U-Net
style encoder/decoder are projected into a fixed BEV voxel grid through a
precomputed pinhole projection (transfuser_utils.py:596-665 builds the
grid), averaged over the height axis, concatenated with the LiDAR BEV
histogram, and passed through a single BEV CNN.

The torch grid_sample becomes a batched bilinear gather (ops/sampling.py);
the projection grid is a compile-time constant (static shapes), so XLA
folds the index arithmetic.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.models.backbones import make_encoder
from carla_garage_tpu.ops.sampling import grid_sample_2d


@dataclasses.dataclass(frozen=True)
class BevProjection:
  """Precomputed pinhole image coordinates for every BEV voxel."""
  coords: np.ndarray   # [D,Hb,Wb,2] (x,y) image pixel coords
  valid: np.ndarray    # [D,Hb,Wb] in-frustum mask


def make_projection_grid(bev_h=64, bev_w=64, n_height=8,
                         min_x=-32.0, max_x=32.0, min_y=-32.0, max_y=32.0,
                         min_z=-10.0, max_z=14.0,
                         img_h=256, img_w=1024, fov_deg=110.0,
                         cam_pos=(-1.5, 0.0, 2.0)) -> BevProjection:
  """Voxel-center -> image-pixel map (transfuser_utils.py:596-665 analog).

  Camera looks along +x with CARLA-style axes (x fwd, y right, z up)."""
  f = img_w / (2.0 * np.tan(np.radians(fov_deg) / 2.0))
  cx, cy = img_w / 2.0, img_h / 2.0
  xs = np.linspace(min_x, max_x, bev_w)
  ys = np.linspace(min_y, max_y, bev_h)
  zs = np.linspace(min_z, max_z, n_height)
  Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")       # [D,Hb,Wb]
  rx = X - cam_pos[0]
  ry = Y - cam_pos[1]
  rz = Z - cam_pos[2]
  eps = 1e-6
  u = cx + f * ry / np.maximum(rx, eps)
  v = cy - f * rz / np.maximum(rx, eps)
  valid = (rx > 0.1) & (u >= 0) & (u < img_w) & (v >= 0) & (v < img_h)
  coords = np.stack([u, v], -1).astype(np.float32)
  return BevProjection(coords=coords, valid=valid.astype(np.float32))


class UpsamplingConcat(nn.Module):
  out_ch: int

  @nn.compact
  def __call__(self, x, skip):
    B, H, W, C = skip.shape
    x = jax.image.resize(x, (B, H, W, x.shape[-1]), method="bilinear")
    h = jnp.concatenate([x, skip], -1)
    h = nn.Conv(self.out_ch, (3, 3), name="conv1")(h)
    h = nn.relu(h)
    h = nn.Conv(self.out_ch, (3, 3), name="conv2")(h)
    return nn.relu(h)


class BevEncoder(nn.Module):
  """Camera U-Net -> BEV projection -> concat LiDAR BEV -> BEV CNN."""
  arch: str = "regnety_032"
  image_features: int = 512
  bev_latent: int = 32
  bev_out: int = 64
  projection: BevProjection = None

  @nn.compact
  def __call__(self, rgb, lidar_bev):
    """rgb [B,Hi,Wi,3], lidar_bev [B,Hb,Wb,C] -> bev features [B,Hb,Wb,F]."""
    feats = make_encoder(self.arch).copy(name="encoder")(rgb)
    # U-Net style top-down to stride-4 rich features
    h = feats[-1]
    h = UpsamplingConcat(self.image_features // 2, name="up1")(h, feats[2])
    h = UpsamplingConcat(self.image_features, name="up2")(h, feats[1])
    h = nn.Conv(self.bev_latent, (1, 1), name="latent_proj")(h)

    proj = self.projection
    coords = jnp.asarray(proj.coords) / 4.0     # features are stride 4
    valid = jnp.asarray(proj.valid)[..., None]
    D, Hb, Wb, _ = proj.coords.shape

    def sample_one(img_feat):
      s = grid_sample_2d(img_feat, coords.reshape(-1, 2))
      return s.reshape(D, Hb, Wb, -1)

    vox = jax.vmap(sample_one)(h) * valid[None]           # [B,D,Hb,Wb,c]
    bev_cam = jnp.mean(vox, axis=1)                       # height average
    fused = jnp.concatenate([bev_cam, lidar_bev], -1)
    h = nn.Conv(self.bev_out, (3, 3), name="bev_conv1")(fused)
    h = nn.relu(h)
    h = nn.Conv(self.bev_out, (3, 3), strides=(2, 2), name="bev_conv2")(h)
    h = nn.relu(h)
    h = nn.Conv(self.bev_out, (3, 3), strides=(2, 2), name="bev_conv3")(h)
    return nn.relu(h)
