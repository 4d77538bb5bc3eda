"""In-graph JPEG compression-artifact emulation.

The reference re-encodes the live camera image as JPEG at inference so the
input statistics match its jpg-stored training data (sensor_agent.py:
277-279, `cv2.imencode('.jpg', ...)` + decode; the dataset itself is saved
as jpg by data_agent.py). A pretrained reference checkpoint therefore
expects block-DCT quantization artifacts in its RGB input. This module
reproduces the lossy part of baseline JPEG as pure XLA ops so the same
conditioning can run inside the jitted sensor pipeline (and as a training
augmentation): RGB -> YCbCr (BT.601 full-range, the JFIF convention),
8x8 block DCT-II, quantization with the Annex-K tables scaled by the
libjpeg quality rule, dequantize, inverse DCT, back to RGB. Chroma
subsampling is omitted (cv2 defaults to 4:2:0, but quantization dominates
the artifact signature; see tests/test_jpeg.py for closeness to a real
codec at 4:4:4).

Everything is 8x8 matmuls over blocked images — MXU-native, fully
differentiable except the rounding (wrap in stop_gradient for straight-
through if used inside a training loss).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ITU-T T.81 Annex K.1 — standard luminance / chrominance tables
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float32)

# 8-point DCT-II orthonormal basis: X_dct = D @ x @ D.T
_D = np.zeros((8, 8), np.float32)
for _k in range(8):
  for _n in range(8):
    _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_D *= np.sqrt(2.0 / 8.0)
_D[0] *= 1.0 / np.sqrt(2.0)


def quality_tables(quality: int):
  """Annex-K tables scaled by the libjpeg quality rule (jcparam.c)."""
  q = int(np.clip(quality, 1, 100))
  scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
  mk = lambda t: np.clip(np.floor((t * scale + 50.0) / 100.0), 1, 255
                         ).astype(np.float32)
  return mk(_Q_LUMA), mk(_Q_CHROMA)


def _blockwise(img: jnp.ndarray, fn):
  """Apply fn to 8x8 blocks of [..., H, W] (H, W multiples of 8)."""
  *lead, H, W = img.shape
  x = img.reshape(*lead, H // 8, 8, W // 8, 8)
  x = jnp.swapaxes(x, -3, -2)                 # [..., H/8, W/8, 8, 8]
  x = fn(x)
  x = jnp.swapaxes(x, -3, -2)
  return x.reshape(*lead, H, W)


def _dct2(blocks):
  return jnp.einsum('ij,...jk,lk->...il', _D, blocks, _D)


def _idct2(blocks):
  return jnp.einsum('ji,...jk,kl->...il', _D, blocks, _D)


def jpeg_artifacts(rgb: jnp.ndarray, quality: int = 80) -> jnp.ndarray:
  """Emulate a JPEG encode/decode round trip on [..., H, W, 3] RGB.

  Accepts float input in [0, 1] (returns the same range, clipped) or
  [0, 255]; H and W must be multiples of 8 (the camera specs here are).
  `quality` is the libjpeg quality knob (cv2 default 95; lower = blockier).
  """
  ql, qc = quality_tables(quality)
  scale255 = bool(rgb.dtype == jnp.uint8) or False
  x = rgb.astype(jnp.float32)
  # detect [0,1] float inputs by construction: callers pass the renderer's
  # [0,1] images; uint8 passes through as 0-255
  unit_range = not scale255
  if unit_range:
    x = x * 255.0
  r, g, b = x[..., 0], x[..., 1], x[..., 2]
  # JFIF BT.601 full-range
  y = 0.299 * r + 0.587 * g + 0.114 * b
  cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
  cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

  def quantize(ch, q):
    def f(blocks):
      coef = _dct2(blocks - 128.0)
      coef = jnp.round(coef / q) * q
      return _idct2(coef) + 128.0
    return _blockwise(ch, f)

  y = quantize(y, jnp.asarray(ql))
  cb = quantize(cb, jnp.asarray(qc))
  cr = quantize(cr, jnp.asarray(qc))

  cb0, cr0 = cb - 128.0, cr - 128.0
  r = y + 1.402 * cr0
  g = y - 0.344136 * cb0 - 0.714136 * cr0
  b = y + 1.772 * cb0
  out = jnp.stack([r, g, b], -1)
  out = jnp.clip(out, 0.0, 255.0)
  if unit_range:
    out = out / 255.0
  return out.astype(rgb.dtype) if scale255 else out
