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


def zero1_spec(x, n: int, axis: str = "dp"):
  """ZeRO-1 PartitionSpec for one optimizer-state leaf: shard the first
  axis divisible by the mesh size, replicate scalars/indivisible leaves.

  The reference's ZeroRedundancyOptimizer shards AdamW moments across DDP
  ranks (train.py:527-531); here the same memory win comes from laying the
  moment tensors out over the dp axis — XLA inserts the all-gathers where
  the (replicated) params consume sharded updates."""
  if not hasattr(x, "ndim") or x.ndim == 0:
    return P()
  for d in range(x.ndim):
    if x.shape[d] % n == 0 and x.shape[d] >= n:
      return P(*([None] * d + [axis]))
  return P()


def zero1_shard_opt_state(mesh: Mesh, opt_state, axis: str = "dp"):
  """Lay an optax state tree out ZeRO-1 style over the mesh."""
  n = mesh.shape[axis]

  def put(x):
    return jax.device_put(
        x, NamedSharding(mesh, zero1_spec(x, n, axis)))

  return jax.tree.map(put, opt_state)
