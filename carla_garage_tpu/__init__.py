"""carla_garage_tpu — a TPU-native closed-loop autonomous-driving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
autonomousvision/carla_garage (TransFuser++): batched closed-loop simulation,
privileged rule-based expert, sensor rendering, imitation-learning training,
and leaderboard-style benchmark evaluation — all as XLA programs over
`jax.sharding.Mesh` device meshes instead of a C++ simulator + SLURM job farm.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  maps/     — tensorized town maps, route compilation (host) + map queries (device)
  sim/      — world state PyTrees, dynamics, expert, traffic, criteria, episode scan
  sensors/  — BEV / camera / LiDAR rendering kernels
  ops/      — Pallas kernels and numeric ops shared across the stack
  models/   — flax policies (TransFuser++, AIM, BEV encoder, PlanT)
  agents/   — agent API (expert autopilot, sensor agent, plant agent)
  train/    — data pipeline + pjit training loop
  eval/     — batched benchmark runner + scoring (Longest6 / LAV)
  parallel/ — mesh + sharding helpers
"""

__version__ = "0.1.0"
