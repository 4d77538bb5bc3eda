"""Device mesh + sharding helpers.

The reference's distributed story is NCCL DDP for training
(train.py:351-377) and a SLURM job farm for evaluation
(evaluate_routes_slurm.py). Here both collapse into `jax.sharding`: the
batch axis (episodes for eval/datagen, samples for training) is sharded
over a `dp` mesh axis; XLA inserts the all-reduces (the DDP/ZeRO
equivalent) over ICI. Multi-slice pods extend the same mesh over DCN via
the JAX distributed runtime — no backend code in this repo.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
  devs = jax.devices()
  n = n_devices or len(devs)
  return Mesh(np.array(devs[:n]), axis_names=(axis,))


def shard_leading(mesh: Mesh, tree, batch: int, axis: str = "dp"):
  """Shard every [batch, ...] leaf over the mesh axis; replicate the rest."""
  dp = NamedSharding(mesh, P(axis))
  rep = NamedSharding(mesh, P())

  def put(x):
    if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == batch:
      return jax.device_put(x, dp)
    return jax.device_put(x, rep)

  return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
  rep = NamedSharding(mesh, P())
  return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
