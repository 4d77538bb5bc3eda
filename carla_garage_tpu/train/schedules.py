"""Learning-rate schedules + learned multi-task loss weighting.

Mirrors train.py's options: MultiStepLR with decay 0.1 at epochs 30/40
(train.py:588-592, config.py:179-180,215) and CosineAnnealingWarmRestarts
with t0=1, t_mult=2 (:593-598, config.py:217-221); Kendall-style learned
task weights (learn_multi_task_weights, train.py:384-456).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def multistep_schedule(base_lr: float, steps_per_epoch: int,
                       milestones=(30, 40), decay: float = 0.1):
  boundaries = {int(m * steps_per_epoch): decay for m in milestones}
  return optax.piecewise_constant_schedule(base_lr, boundaries)


def cosine_restart_schedule(base_lr: float, steps_per_epoch: int,
                            t0_epochs: int = 1, t_mult: int = 2,
                            n_cycles: int = 8):
  """SGDR: cosine cycles of length t0 * t_mult^k epochs."""
  schedules, boundaries = [], []
  total = 0
  length = t0_epochs * steps_per_epoch
  for _ in range(n_cycles):
    schedules.append(optax.cosine_decay_schedule(base_lr, length))
    total += length
    boundaries.append(total)
    length *= t_mult
  return optax.join_schedules(schedules, boundaries[:-1])


def uncertainty_weighted_total(losses: dict, log_vars: dict):
  """Kendall multi-task weighting: sum exp(-s_i) L_i + s_i (the learned
  alternative to fixed loss weights, train.py:384-456). Loss keys without
  a learned variance fall back to unit weight."""
  total = 0.0
  for k, v in losses.items():
    s = log_vars.get(k)
    if s is None:
      total = total + v
    else:
      total = total + jnp.exp(-s) * v + s
  return total


def init_log_vars(loss_keys) -> dict:
  return {k: jnp.zeros(()) for k in loss_keys}
