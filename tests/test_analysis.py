"""Result-analytics tests: infraction event log, recorded trajectories,
infraction maps + replay clips (eval/analysis.py), Video Swin encoder."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.config import DEFAULT_CONFIG as CFG
from carla_garage_tpu.eval.analysis import (events_from_criteria,
                                            infraction_map, replay_clip,
                                            write_analysis)
from carla_garage_tpu.sim.episode import rollout_recorded
from carla_garage_tpu.sim.scene_builder import make_synthetic_batch
from carla_garage_tpu.structs import EventKind


def _crash_setup():
  """An episode engineered to collide: an NPC parked right on the route."""
  town, maps, lanes, scene, state = make_synthetic_batch(
      CFG, batch=2, seed=5, n_vehicles=4, n_walkers=1)
  veh = state.vehicles
  block = np.asarray(scene.route.points)[0, 40]
  pos = np.array(veh.pos)
  val = np.array(veh.valid)
  pos[0, 0] = block
  val[0, 0] = True
  # park it: lane far beyond its end so it never moves
  state = state.replace(vehicles=veh.replace(
      pos=jnp.asarray(pos), valid=jnp.asarray(val),
      speed=jnp.zeros_like(veh.speed)))
  return town, maps, lanes, scene, state


def test_event_log_and_recorded_rollout(tmp_path):
  town, maps, lanes, scene, state = _crash_setup()
  final, traj = jax.jit(lambda sc, st: rollout_recorded(
      CFG, maps, lanes, sc, st, 600, every=10))(scene, state)
  assert traj["ego"].shape[0] == 60
  cr = final.criteria
  n0 = int(np.asarray(cr.event_count)[0])
  evs = events_from_criteria(cr, 0)
  assert len(evs) == n0
  if n0:                      # the parked NPC should have been hit
    kinds = {e["kind"] for e in evs}
    assert EventKind.COLLISION_VEHICLE in kinds
    ev = evs[0]
    assert ev["tick"] > 0
    # event position is on/near the route
    d = np.linalg.norm(np.asarray(scene.route.points)[0] -
                       np.array(ev["pos"]), axis=-1).min()
    assert d < 15.0

  # artifacts render end-to-end
  out = write_analysis(
      str(tmp_path),
      {"SynthTown": (np.asarray(maps.layers[0]),
                     np.asarray(maps.world_offset[0]), float(maps.ppm))},
      {"SynthTown": [(0, evs)]},
      {"SynthTown": [np.asarray(scene.route.points)[0]]},
      {"SynthTown": jax.tree.map(np.asarray, traj)})
  assert any(p.endswith(".png") for p in out)
  for p in out:
    assert os.path.getsize(p) > 1000


def test_swin3d_shapes():
  from carla_garage_tpu.models.video_nets import SwinTransformer3D
  m = SwinTransformer3D(embed_dim=16, depths=(1, 1, 1, 1),
                        n_heads=(2, 2, 2, 2), window=(2, 4, 4))
  x = jnp.ones((1, 2, 64, 64, 2))
  p = m.init(jax.random.key(0), x)
  out = m.apply(p, x)
  assert [o.shape for o in out] == [
      (1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]
  assert all(bool(jnp.isfinite(o).all()) for o in out)
