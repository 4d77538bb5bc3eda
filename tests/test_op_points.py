"""Sensor-agent operating-point tests (sensor_agent.py:544-657 analogs).

Round-2 verdict: stop_control, temporal LiDAR K>1, map_track, ensembles
and uncertainty_weight=False existed but were never executed by a test.
Each branch is driven closed-loop here. The detected-stop-sign controller
is tested with a SCRIPTED model whose CenterNet head deterministically
emits a class-3 (stop sign) detection dead ahead — the agent must brake to
a full stop inside the box, then proceed (STOP_CONTROL=1, the LAV
operating point, ref sensor_agent.py:617-657)."""

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
from carla_garage_tpu.sim.episode import rollout, sim_step
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch

CAM = camera_ray_grid(CFG, scale=8)            # 32 x 128
LID_F = lidar_ray_grid(CFG, half=0, decimate=16)
LID_R = lidar_ray_grid(CFG, half=1, decimate=16)
N_LIDAR = LID_F.shape[0] * LID_F.shape[1]


def tiny_tcfg(**kw):
  return dataclasses.replace(
      micro_config(), img_h=32, img_w=128, lidar_h=256, lidar_w=256,
      img_anchors=(1, 4), lidar_anchors=(8, 8), **kw)


class ScriptedModel:
  """Stands in for LidarCenterNet: constant GO at 8 m/s, straight-ahead
  checkpoints, and a class-3 CenterNet peak `stop_x` meters ahead."""

  def __init__(self, stop_x=10.0, grid=64, speed_cls=3):
    self.stop_x = stop_x
    self.grid = grid
    self.speed_cls = speed_cls

  def apply(self, params, rgb, lidar_bev, target_point, cmd, speed):
    B = rgb.shape[0]
    g = self.grid
    ts = jnp.full((B, 4), -10.0).at[:, self.speed_cls].set(10.0)
    ckpt = jnp.stack([
        jnp.tile(jnp.arange(1, 11, dtype=jnp.float32)[None], (B, 1)),
        jnp.zeros((B, 10))], -1)
    ppm = g / 64.0
    cx = int((self.stop_x - CFG.sensor.min_x) * ppm)
    cy = int((0.0 - CFG.sensor.min_y) * ppm)
    heat = jnp.full((B, g, g, 4), -10.0).at[:, cy, cx, 3].set(10.0)
    bb = {
        "heatmap": heat,
        "wh": jnp.full((B, g, g, 2), 1.5 * ppm),
        "offset": jnp.zeros((B, g, g, 2)),
        "yaw_class": jnp.full((B, g, g, 12), -5.0).at[..., 0].set(5.0),
        "yaw_res": jnp.zeros((B, g, g, 1)),
    }
    return {"pred_target_speed": ts, "pred_checkpoint": ckpt,
            "pred_bb": bb}


def _scene(B=2, seed=6):
  return make_synthetic_batch(CFG, batch=B, seed=seed, n_vehicles=0,
                              n_walkers=0)


def test_stop_control_halts_then_proceeds():
  B = 2
  town, maps, lanes, scene, state = _scene(B)
  state = state.replace(agent=sensor_agent_reset(CFG, B, N_LIDAR))
  policy = make_transfuser_policy(
      ScriptedModel(stop_x=10.0), {}, tiny_tcfg(), CAM, LID_F, LID_R,
      direct=True, stop_control=True)

  def body(st, _):
    st2 = sim_step(CFG, maps, lanes, scene, st, policy)
    return st2, (st2.ego.speed, st2.agent.stop_box_valid,
                 st2.agent.clear_stop)

  run = jax.jit(lambda st: jax.lax.scan(body, st, None, length=220))
  final, (speeds, valids, clears) = run(state)
  speeds = np.asarray(speeds)            # [T,B]
  clears = np.asarray(clears)
  # the agent accelerates toward 8 m/s...
  assert speeds.max() > 2.0
  # ...must come to a full stop inside the detected box...
  stop_t = np.argmax((speeds <= 0.02) & (np.arange(220) > 20)[:, None],
                     axis=0)
  assert (stop_t > 0).all(), f"never stopped: min speeds {speeds.min(0)}"
  # ...with the post-clear cooldown armed around that point (the
  # controller clears one policy tick after speed crosses ITS threshold
  # 0.01 — the sampled 0.02-crossing can lead it by a few ticks)...
  assert all(clears[stop_t[b]:stop_t[b] + 8, b].max() > 0
             for b in range(B))
  # ...and then proceeds (speed recovers after the stop)
  assert all(speeds[stop_t[b]:, b].max() > 0.5 for b in range(B))
  # a stop sign was actually tracked at some point
  assert bool(np.asarray(valids).any())


def test_temporal_lidar_buffer_rotates():
  B = 2
  tcfg = tiny_tcfg(lidar_channels=4)     # 2 live + 2 older-sweep channels
  model = LidarCenterNet(tcfg)
  rgb = jnp.zeros((B, 32, 128, 3))
  lidar = jnp.zeros((B, 256, 256, 4))
  params = model.init(jax.random.key(0), rgb, lidar, jnp.zeros((B, 2)),
                      jnp.zeros((B, 6)), jnp.zeros((B,)))
  town, maps, lanes, scene, state = _scene(B)
  state = state.replace(agent=sensor_agent_reset(CFG, B, N_LIDAR,
                                                 seq_len=2))
  policy = make_transfuser_policy(model, None, tcfg, CAM, LID_F, LID_R,
                                  direct=True)
  run = jax.jit(lambda sc, st, pp: rollout(CFG, maps, lanes, sc, st, 4,
                                           policy=policy, policy_params=pp))
  out = run(scene, state, params)
  assert out.agent.prev_lidar.shape[1] == 2
  # after 4 ticks both buffer slots hold real (non-empty) half sweeps
  assert bool(jnp.any(out.agent.prev_lidar_valid[:, 0]))
  assert bool(jnp.any(out.agent.prev_lidar_valid[:, 1]))
  assert bool(jnp.all(jnp.isfinite(out.ego.pos)))


def test_map_track_follows_route():
  B = 2
  town, maps, lanes, scene, state = _scene(B)
  state = state.replace(agent=sensor_agent_reset(CFG, B, N_LIDAR))
  policy = make_transfuser_policy(
      ScriptedModel(), {}, tiny_tcfg(), CAM, LID_F, LID_R,
      direct=True, map_track=True)
  run = jax.jit(lambda sc, st: rollout(CFG, maps, lanes, sc, st, 60,
                                       policy=policy))
  out = run(scene, state)
  # MAP track aims at the dense route — the agent advances along it
  assert float(jnp.min(out.agent.planner_dense.idx)) > 0
  assert bool(jnp.all(jnp.isfinite(out.ego.pos)))


def test_ensemble_two_models_averages():
  B = 2
  tcfg = tiny_tcfg()
  model = LidarCenterNet(tcfg)
  rgb = jnp.zeros((B, 32, 128, 3))
  lidar = jnp.zeros((B, 256, 256, 2))
  params = model.init(jax.random.key(0), rgb, lidar, jnp.zeros((B, 2)),
                      jnp.zeros((B, 6)), jnp.zeros((B,)))
  town, maps, lanes, scene, state = _scene(B)
  state = state.replace(agent=sensor_agent_reset(CFG, B, N_LIDAR))
  policy = make_transfuser_policy(model, None, tcfg, CAM, LID_F, LID_R,
                                  direct=True)
  run = jax.jit(lambda sc, st, pp: rollout(CFG, maps, lanes, sc, st, 6,
                                           policy=policy, policy_params=pp))
  single = run(scene, state, [params])
  double = run(scene, state, [params, params])
  # an ensemble of two identical members must drive identically
  np.testing.assert_allclose(np.asarray(single.ego.pos),
                             np.asarray(double.ego.pos), atol=1e-4)
  # and a 2-member ensemble of DIFFERENT models still drives
  params2 = model.init(jax.random.key(1), rgb, lidar, jnp.zeros((B, 2)),
                       jnp.zeros((B, 6)), jnp.zeros((B,)))
  mixed = run(scene, state, [params, params2])
  assert bool(jnp.all(jnp.isfinite(mixed.ego.pos)))


def test_uncertainty_weight_off_argmax_speed():
  B = 2
  town, maps, lanes, scene, state = _scene(B)
  state = state.replace(agent=sensor_agent_reset(CFG, B, N_LIDAR))
  # scripted model wants class 2 (5 m/s); argmax must select exactly it
  policy = make_transfuser_policy(
      ScriptedModel(speed_cls=2), {}, tiny_tcfg(), CAM, LID_F, LID_R,
      direct=True, uncertainty_weight=False)
  run = jax.jit(lambda sc, st: rollout(CFG, maps, lanes, sc, st, 300,
                                       policy=policy))
  out = run(scene, state)
  v = float(jnp.max(out.ego.speed))
  # PID ramps ~0.4 m/s^2 from standstill; by tick 300 it must sit ON the
  # argmax class's 5 m/s, not the 8 m/s of the max-speed class
  assert 4.5 < v < 6.0, f"argmax target speed 5 m/s not tracked: {v}"
