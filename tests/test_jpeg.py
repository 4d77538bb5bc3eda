"""JPEG artifact emulation vs a real codec (ref sensor_agent.py:277-279)."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from carla_garage_tpu.ops.jpeg import jpeg_artifacts, quality_tables


def _pil_roundtrip(img_u8: np.ndarray, quality: int) -> np.ndarray:
  from PIL import Image
  buf = io.BytesIO()
  # 4:4:4 to match the emulation (quantization artifacts only)
  Image.fromarray(img_u8).save(buf, "JPEG", quality=quality,
                               subsampling=0)
  buf.seek(0)
  return np.asarray(Image.open(buf).convert("RGB"))


def _test_image(h=64, w=64, seed=0):
  rng = np.random.default_rng(seed)
  yy, xx = np.mgrid[0:h, 0:w]
  smooth = np.stack([np.sin(xx / 9.0), np.cos(yy / 7.0),
                     np.sin((xx + yy) / 11.0)], -1) * 0.5 + 0.5
  noise = rng.uniform(0, 1, (h, w, 3)) * 0.3
  return np.clip(smooth * 0.7 + noise, 0, 1).astype(np.float32)


def test_quality_tables_match_libjpeg_rule():
  ql50, _ = quality_tables(50)
  assert np.array_equal(ql50[0, :3], [16, 11, 10])   # unscaled at q=50
  ql100, qc100 = quality_tables(100)
  assert ql100.max() == 1 and qc100.max() == 1       # lossless tables
  ql10, _ = quality_tables(10)
  assert ql10.mean() > ql50.mean() * 3               # much coarser


def test_high_quality_near_identity():
  img = _test_image()
  out = np.asarray(jpeg_artifacts(jnp.asarray(img), quality=100))
  assert np.abs(out - img).max() < 0.04              # rounding only


def test_quality_monotonic_degradation():
  img = _test_image()
  errs = [float(np.mean((np.asarray(jpeg_artifacts(jnp.asarray(img), q))
                         - img) ** 2)) for q in (90, 50, 15)]
  assert errs[0] < errs[1] < errs[2]


def test_matches_real_codec_better_than_identity():
  """The emulated round trip must land closer to a real JPEG round trip
  than the pristine input does — i.e. it reproduces the artifact
  signature, not just generic blurring."""
  img = _test_image(seed=3)
  u8 = (img * 255).round().astype(np.uint8)
  for q in (30, 60, 85):
    real = _pil_roundtrip(u8, q).astype(np.float32) / 255.0
    ours = np.asarray(jpeg_artifacts(jnp.asarray(img), quality=q))
    d_ours = float(np.mean((ours - real) ** 2))
    d_id = float(np.mean((img - real) ** 2))
    assert d_ours < d_id, (q, d_ours, d_id)


def test_uint8_and_batch_shapes():
  img = (_test_image() * 255).round().astype(np.uint8)
  batch = jnp.asarray(np.stack([img, img]))
  out = jpeg_artifacts(batch, quality=60)
  assert out.shape == batch.shape and out.dtype == jnp.uint8
