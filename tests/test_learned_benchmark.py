"""Learned-checkpoint evaluation plumbing (run_benchmarks.py --agent
transfuser): the benchmark evaluator must accept a trained checkpoint and
drive it over benchmark routes the way the reference's leaderboard evaluates
a SensorAgent checkpoint directory (leaderboard_evaluator_local.py agent
loading + sensor_agent.py:114-131).

Covers the two pieces the CLI composes:
 - utils/checkpoint.load_checkpoint(meta_only=True): recover the model
   config from the sidecar BEFORE a params template can be built
 - eval/benchmark.run_carla_benchmark-style rollout: rollout_chunked with
   an installed sensor-agent state and params forwarded through the jit
   boundary (policy_params)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.agents.sensor_agent import (make_transfuser_policy,
                                                  sensor_agent_reset)
from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.models.transfuser import LidarCenterNet, micro_config
from carla_garage_tpu.sensors.camera import camera_ray_grid
from carla_garage_tpu.sensors.lidar import lidar_ray_grid
from carla_garage_tpu.sim.episode import rollout_chunked
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch
from carla_garage_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

CAM = camera_ray_grid(CFG, scale=8)            # 32 x 128
LID_F = lidar_ray_grid(CFG, half=0, decimate=16)
LID_R = lidar_ray_grid(CFG, half=1, decimate=16)
N_LIDAR = LID_F.shape[0] * LID_F.shape[1]


def tiny_tcfg():
  return dataclasses.replace(
      micro_config(), img_h=32, img_w=128, lidar_h=256, lidar_w=256,
      img_anchors=(1, 4), lidar_anchors=(8, 8))


def test_checkpoint_meta_only_roundtrip(tmp_path):
  params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros((3,))}
  meta = {"model": "transfuser", "step": 7,
          "config": dataclasses.asdict(tiny_tcfg())}
  path = str(tmp_path / "ckpt")
  save_checkpoint(path, params, meta=meta)
  # meta first (no template yet) — this is how the CLI recovers the
  # architecture before it can build a params template
  none_params, meta2 = load_checkpoint(path, meta_only=True)
  assert none_params is None
  assert meta2["step"] == 7
  assert meta2["config"]["img_w"] == 128
  # then the full restore against a template built FROM that meta
  tpl = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype), params)
  params2, meta3 = load_checkpoint(path, tpl)
  np.testing.assert_array_equal(np.asarray(params2["w"]),
                                np.asarray(params["w"]))
  assert meta3["step"] == 7


def test_rollout_chunked_with_learned_policy_and_agent_state():
  """The exact evaluator composition for --agent transfuser: agent state
  installed via sensor_agent_reset, params through rollout_chunked."""
  B = 2
  tcfg = tiny_tcfg()
  model = LidarCenterNet(tcfg)
  rgb = jnp.zeros((B, 32, 128, 3))
  lidar = jnp.zeros((B, 256, 256, tcfg.lidar_channels))
  params = model.init(jax.random.key(0), rgb, lidar, jnp.zeros((B, 2)),
                      jnp.zeros((B, 6)), jnp.zeros((B,)))
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=B, seed=3, n_vehicles=2, n_walkers=1)
  state = state.replace(agent=sensor_agent_reset(CFG, B, N_LIDAR))
  policy = make_transfuser_policy(model, None, tcfg, CAM, LID_F, LID_R,
                                  direct=True, bf16=True)
  final = rollout_chunked(CFG, maps, lanes, scene, state, max_ticks=8,
                          chunk=4, policy=policy, policy_params=params)
  assert int(np.asarray(final.tick).min()) >= 8 or bool(
      np.asarray(final.done).all())
  assert bool(np.all(np.isfinite(np.asarray(final.ego.pos))))
