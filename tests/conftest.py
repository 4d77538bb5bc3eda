"""Test harness: force an 8-device virtual CPU mesh.

The container's sitecustomize imports JAX at interpreter startup with
JAX_PLATFORMS=axon (real TPU tunnel), so env vars alone are too late here —
we must update the live config before any backend is initialized. Tests run
on an 8-device virtual CPU mesh so sharding paths are exercised without
hardware (SURVEY.md environment notes).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
