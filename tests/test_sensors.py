"""Sensor rendering tests: BEV semantics, camera raycast, LiDAR raycast."""

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.sensors.bev import BevClass, render_bev_semantics
from carla_garage_tpu.sensors.camera import camera_ray_grid, render_camera
from carla_garage_tpu.sensors.lidar import lidar_ray_grid, render_lidar
from carla_garage_tpu.sensors.raycast import Sem
from carla_garage_tpu.sensors.voxelize import voxelize
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch


def _batch():
  return make_synthetic_batch(CFG, batch=2, seed=4, n_vehicles=6,
                              n_walkers=2)


def test_bev_semantics():
  town, maps, lanes, scene, state = _batch()
  bev = jax.jit(lambda sc, st: render_bev_semantics(CFG, maps, sc, st))(
      scene, state)
  assert bev.shape == (2, 256, 256)
  classes = np.unique(np.asarray(bev))
  assert BevClass.ROAD in classes
  # the ego sits on the road, facing +x in grid coords; the ego-center cell
  # must be road (or lane marking)
  center = np.asarray(bev)[:, 128, 128]
  assert np.all((center == BevClass.ROAD) | (center == BevClass.LANE_MARKING)
                | (center == BevClass.LANE_MARKING_BROKEN))


def test_camera_render():
  town, maps, lanes, scene, state = _batch()
  grid = camera_ray_grid(CFG, scale=8)            # 128x32 for CPU speed
  out = jax.jit(lambda sc, st: render_camera(CFG, maps, sc, st, grid))(
      scene, state)
  assert out["rgb"].shape == (2, 32, 128, 3)
  assert out["semantic"].shape == (2, 32, 128)
  sem = np.asarray(out["semantic"])
  # upper rows are sky; the lower half of the image contains road
  assert (sem[:, 0] == Sem.SKY).mean() > 0.9
  assert (sem[:, 16:] == Sem.ROAD).mean() > 0.1
  d = np.asarray(out["depth"])
  # the bottom row is nearby ground, rows near the horizon are far
  assert d[:, -1].mean() < 20.0
  assert d[0, -1].mean() < d[0, 20].mean()


def test_lidar_and_voxelize():
  town, maps, lanes, scene, state = _batch()
  grid = lidar_ray_grid(CFG, half=0, decimate=8)
  rng = jax.random.key(0)
  pts, valid = jax.jit(lambda sc, st: render_lidar(
      CFG, maps, sc, st, grid, rng))(scene, state)
  B, N = valid.shape
  assert pts.shape == (B, N, 3)
  assert 0.1 < float(jnp.mean(valid)) < 0.7     # dropoff ~0.45 + misses
  # ground hits should be near z ~ 0 in ego frame
  zs = np.asarray(pts[..., 2])[np.asarray(valid)]
  assert np.percentile(zs, 10) > -1.0
  hist = jax.jit(lambda p, v: voxelize(p, v, CFG))(pts[0], valid[0])
  assert hist.shape == (2, 256, 256)
  assert float(jnp.sum(hist)) > 0
