"""Bilinear grid sampling — torch.grid_sample replacement as XLA gathers."""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
  """Bilinear sample. img [H,W,C]; coords [...,2] as (x, y) pixel floats.
  Out-of-bounds clamps to border. Returns [...,C]."""
  H, W, C = img.shape
  x = jnp.clip(coords[..., 0], 0.0, W - 1.0)
  y = jnp.clip(coords[..., 1], 0.0, H - 1.0)
  x0 = jnp.floor(x).astype(jnp.int32)
  y0 = jnp.floor(y).astype(jnp.int32)
  x1 = jnp.minimum(x0 + 1, W - 1)
  y1 = jnp.minimum(y0 + 1, H - 1)
  wx = (x - x0)[..., None]
  wy = (y - y0)[..., None]
  v00 = img[y0, x0]
  v01 = img[y0, x1]
  v10 = img[y1, x0]
  v11 = img[y1, x1]
  return ((1 - wy) * ((1 - wx) * v00 + wx * v01) +
          wy * ((1 - wx) * v10 + wx * v11))
