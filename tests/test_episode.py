"""Integration tests: full closed-loop episodes with the expert.

The analog of the reference's 'run a debug route and check the expert gets
DS=100' loop (local_evaluation.sh; data quality gate data.py:91-95)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.sim.episode import rollout
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch
from carla_garage_tpu.sim.scoring import compute_scores, global_stats


@pytest.fixture(scope="module")
def clean_batch():
  """Batch without traffic/walkers: pure routing + lights + stops."""
  return make_synthetic_batch(CFG, batch=2, seed=3, n_vehicles=0,
                              n_walkers=0)


def _route_lens(scene):
  seg = np.asarray(scene.route.seg_len)
  nv = np.asarray(scene.route.num_valid)
  return np.array([seg[i, :nv[i]].sum() for i in range(len(nv))])


def test_expert_completes_clean_routes(clean_batch):
  town, maps, lanes, scene, state = clean_batch
  run = jax.jit(lambda sc, st: rollout(CFG, maps, lanes, sc, st, 256))
  s = state
  for _ in range(14):
    s = run(scene, s)
    if bool(jnp.all(s.done)):
      break
  assert bool(jnp.all(s.done)), "episodes did not finish"
  cr = s.criteria
  np.testing.assert_array_equal(np.asarray(cr.n_collision_vehicle), 0)
  np.testing.assert_array_equal(np.asarray(cr.n_collision_walker), 0)
  np.testing.assert_array_equal(np.asarray(cr.n_collision_static), 0)
  np.testing.assert_array_equal(np.asarray(cr.n_red_light), 0)
  assert np.all(np.asarray(cr.route_completion) >=
                CFG.criteria.min_route_completion)
  scores = compute_scores(CFG, cr, jnp.asarray(_route_lens(scene)))
  # expert quality gate: DS=100 without traffic (data.py:91-95 semantics)
  np.testing.assert_allclose(np.asarray(scores.score_composed), 100.0,
                             atol=1e-3)
  g = global_stats(scores)
  assert float(g['driving_score']) == pytest.approx(100.0, abs=1e-3)


def test_expert_with_traffic_mostly_clean():
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=4, seed=1, n_vehicles=6, n_walkers=2)
  run = jax.jit(lambda sc, st: rollout(CFG, maps, lanes, sc, st, 256))
  s = state
  for _ in range(14):
    s = run(scene, s)
    if bool(jnp.all(s.done)):
      break
  assert bool(jnp.all(s.done))
  scores = compute_scores(CFG, s.criteria, jnp.asarray(_route_lens(scene)))
  ds = float(np.mean(np.asarray(scores.score_composed)))
  # privileged expert parity target: reference expert scores DS 81 on
  # Longest6 (docs/additional_features.md:13) — require >= 80 here
  assert ds >= 80.0, f"expert DS {ds}"


def test_done_episodes_freeze(clean_batch):
  town, maps, lanes, scene, state = clean_batch
  run = jax.jit(lambda sc, st: rollout(CFG, maps, lanes, sc, st, 256))
  s = state
  for _ in range(20):
    s = run(scene, s)
    if bool(jnp.all(s.done)):
      break
  pos_a = np.asarray(s.ego.pos)
  s2 = run(scene, s)
  np.testing.assert_array_equal(pos_a, np.asarray(s2.ego.pos))
  np.testing.assert_array_equal(np.asarray(s.tick), np.asarray(s2.tick))


def test_walker_crossing_triggers_brake():
  """A walker crossing ahead must make the expert brake (no collision)."""
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=2, seed=5, n_vehicles=0, n_walkers=2)
  run = jax.jit(lambda sc, st: rollout(CFG, maps, lanes, sc, st, 256))
  s = state
  for _ in range(14):
    s = run(scene, s)
    if bool(jnp.all(s.done)):
      break
  np.testing.assert_array_equal(np.asarray(s.criteria.n_collision_walker), 0)
  assert np.all(np.asarray(s.criteria.route_completion) >= 0.99)
