"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.ops.pallas.bev_fill import (fill_boxes_bev,
                                                  fill_boxes_bev_reference)


def test_bev_fill_matches_reference():
  rng = np.random.default_rng(0)
  B, V = 2, 8
  cx = jnp.asarray(rng.uniform(20, 230, (B, V)), jnp.float32)
  cy = jnp.asarray(rng.uniform(20, 230, (B, V)), jnp.float32)
  yaw = jnp.asarray(rng.uniform(-3, 3, (B, V)), jnp.float32)
  ex = jnp.asarray(rng.uniform(4, 12, (B, V)), jnp.float32)
  ey = jnp.asarray(rng.uniform(2, 6, (B, V)), jnp.float32)
  cls = jnp.asarray(rng.integers(1, 10, (B, V)), jnp.int32)
  valid = jnp.asarray(rng.integers(0, 2, (B, V)) > 0)

  ref = fill_boxes_bev_reference(cx, cy, yaw, ex, ey, cls, valid)
  out = fill_boxes_bev(cx, cy, yaw, ex, ey, cls, valid)
  np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
