"""Tests: UKF tracking, geodesy round-trip, video nets, watchdog, models."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.models.video_nets import VideoResNet
from carla_garage_tpu.sim.dynamics import bicycle_step
from carla_garage_tpu.sim.ukf import ukf_predict, ukf_reset, ukf_update
from carla_garage_tpu.utils.geodesy import gps_to_carla, location_to_gps
from carla_garage_tpu.utils.watchdog import Watchdog


def test_ukf_tracks_bicycle_through_noise():
  rng = np.random.default_rng(0)
  B = 2
  st = ukf_reset(B)
  pos = jnp.zeros((B, 2))
  yaw = jnp.zeros((B,))
  speed = jnp.zeros((B,))
  steer = jnp.full((B,), 0.1)
  throttle = jnp.full((B,), 0.6)
  brake = jnp.zeros((B,))
  for t in range(80):
    pos, yaw, speed = bicycle_step(pos, yaw, speed, steer, throttle,
                                   brake, CFG.sim)
    z = jnp.stack([pos[:, 0] + 0.55 * rng.standard_normal(B),
                   pos[:, 1] + 0.55 * rng.standard_normal(B),
                   yaw, speed], -1)
    st = ukf_predict(st, steer, throttle, brake, CFG.sim)
    st = ukf_update(st, z)
  err = np.linalg.norm(np.asarray(st.x[:, :2] - pos), axis=-1)
  # the filter should beat the raw 0.55 m noise
  assert np.all(err < 0.5), err


def test_geodesy_roundtrip():
  # the reference's fixed GPS scale corresponds to a lat_ref ~ 0 Mercator
  # (nav_planner.py:64-66); the roundtrip is approximate by construction
  xy = np.array([[100.0, -50.0], [0.0, 0.0], [-300.0, 420.0]])
  back = gps_to_carla(location_to_gps(xy, lat_ref=0.0, lon_ref=0.0))
  np.testing.assert_allclose(back, xy, atol=1.0)


def test_video_resnet_shapes():
  m = VideoResNet(widths=(8, 16, 32, 64))
  x = jnp.zeros((2, 3, 64, 64, 2))
  params = m.init(jax.random.key(0), x)
  feats = m.apply(params, x)
  assert len(feats) == 4
  assert feats[0].shape == (2, 32, 32, 8)
  assert feats[-1].shape == (2, 4, 4, 64)


def test_watchdog_trips_and_stops():
  w = Watchdog(0.2)
  w.start()
  w.stop()
  time.sleep(0.3)
  assert not w.tripped
  w2 = Watchdog(0.05)
  w2.start()
  try:
    time.sleep(0.3)
  except KeyboardInterrupt:
    pass
  assert w2.tripped
