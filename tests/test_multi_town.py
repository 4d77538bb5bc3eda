"""Mixed-town single-batch: two different synthetic towns in one rollout."""

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.maps.synthetic import make_town, sample_route_keypoints
from carla_garage_tpu.sim.episode import rollout
from carla_garage_tpu.sim.scene_builder import build_batch, compile_route


def test_two_towns_one_batch():
  rng = np.random.default_rng(0)
  town_a = make_town(n_x=3, n_y=3, block=100.0, seed=1)
  town_b = make_town(n_x=4, n_y=3, block=120.0, seed=2)
  eps, town_idx = [], []
  for ti, t in enumerate((town_a, town_b)):
    for _ in range(2):
      xy, yaw = sample_route_keypoints(t, rng, min_len_m=200.0)
      eps.append(compile_route(t, xy, yaw))
      town_idx.append(ti)
  maps, lanes, scene, state = build_batch(
      CFG, [town_a, town_b], eps, n_vehicles=3, n_walkers=1,
      town_of_episode=town_idx)
  assert maps.layers.shape[0] == 2
  np.testing.assert_array_equal(np.asarray(scene.town_id), town_idx)

  run = jax.jit(lambda sc, st: rollout(CFG, maps, lanes, sc, st, 256))
  s = state
  for _ in range(10):
    s = run(scene, s)
    if bool(jnp.all(s.done)):
      break
  # all four episodes drive: substantial progress in both towns
  assert np.all(np.asarray(s.criteria.route_completion) > 0.5)
  assert np.all(np.asarray(s.criteria.n_collision_static) == 0)
