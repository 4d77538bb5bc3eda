"""Mesh / ZeRO-1 / dp-meshed benchmark tests (run on the 8-device virtual
CPU mesh from conftest — SURVEY.md §2.8 parallelism inventory)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.eval.benchmark import (_pad_for_mesh, _records,
                                             _shard_episode_batch, aggregate)
from carla_garage_tpu.parallel.mesh import (make_mesh, zero1_shard_opt_state,
                                            zero1_spec)
from carla_garage_tpu.sim.episode import rollout_chunked
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch

from jax.sharding import PartitionSpec as P


def test_zero1_spec_picks_divisible_axis():
  assert zero1_spec(jnp.zeros(()), 4) == P()
  assert zero1_spec(jnp.zeros((8, 3)), 4) == P("dp")
  assert zero1_spec(jnp.zeros((3, 8)), 4) == P(None, "dp")
  assert zero1_spec(jnp.zeros((3, 5)), 4) == P()   # nothing divisible
  assert zero1_spec(jnp.zeros((2,)), 4) == P()     # too small to split


def test_zero1_opt_state_sharded_and_usable():
  """AdamW moments laid out over dp must still drive a correct update
  against replicated params (the all-gather is XLA's job)."""
  mesh = make_mesh(4)
  params = {"w": jnp.ones((8, 16)), "b": jnp.zeros((3,))}
  tx = optax.adamw(1e-2)
  opt = tx.init(params)
  opt_sharded = zero1_shard_opt_state(mesh, opt)
  # the big moment leaf is actually partitioned
  mu_w = opt_sharded[0].mu["w"]
  assert len(mu_w.sharding.device_set) == 4

  def step(p, o):
    g = jax.tree.map(jnp.ones_like, p)
    up, o2 = tx.update(g, o, p)
    return optax.apply_updates(p, up), o2

  p1, o1 = jax.jit(step)(params, opt_sharded)
  p2, o2 = jax.jit(step)(params, opt)
  np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]),
                             atol=1e-6)


def test_pad_for_mesh():
  mesh = make_mesh(4)
  eps, ids, (extra,) = _pad_for_mesh(mesh, [1, 2, 3], ["a", "b", "c"],
                                     (["x", "y", "z"],))
  assert len(eps) == 4 and eps[-1] == 3
  assert ids == ["a", "b", "c", None]
  assert extra == ["x", "y", "z", "z"]
  eps2, ids2, _ = _pad_for_mesh(mesh, [1, 2, 3, 4], list("abcd"))
  assert len(eps2) == 4 and ids2 == list("abcd")


def test_meshed_benchmark_episode_batch():
  """A 2-device dp mesh drives the benchmark rollout path end-to-end:
  sharded scene/state, replicated rasters, records produced per episode
  (the evaluate_routes_slurm.py job farm collapsed onto a mesh)."""
  mesh = make_mesh(2)
  B = 4
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=B, seed=11, n_vehicles=2, n_walkers=1)
  maps, lanes, scene, state = _shard_episode_batch(
      mesh, maps, lanes, scene, state)
  assert len(scene.route.num_valid.sharding.device_set) == 2
  final = rollout_chunked(CFG, maps, lanes, scene, state,
                          max_ticks=64, chunk=32)
  recs = _records(CFG, scene, final,
                  [f"m_{i}" for i in range(B)], "SynthTown")
  assert len(recs) == B
  g = aggregate(recs)
  assert g["num_routes"] == B
  # the ego actually moved under the meshed step
  assert float(jnp.max(jnp.abs(final.ego.pos - state.ego.pos))) > 0.1
