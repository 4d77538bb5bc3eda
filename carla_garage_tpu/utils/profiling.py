"""Profiling — first-class, unlike the reference (SURVEY.md §5: the
reference has no tracing beyond tqdm and TensorBoard scalars).

- `trace(dir)`: context manager around jax.profiler for TensorBoard/XProf
  traces of the jitted step.
- `Throughput`: steps/sec/chip counter — the north-star metric.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class Throughput:
  """Running env-steps/sec counter."""

  def __init__(self):
    self.t0 = time.perf_counter()
    self.steps = 0

  def add(self, env_steps: int):
    self.steps += env_steps

  @property
  def per_sec(self) -> float:
    dt = time.perf_counter() - self.t0
    return self.steps / dt if dt > 0 else 0.0

  def per_chip(self) -> float:
    return self.per_sec / max(jax.device_count(), 1)
