"""carla_garage_tpu — TPU-native re-design of carla_garage.

Persistent-compilation-cache hook: the container's sitecustomize imports
jax (axon PJRT registration) BEFORE any entry script runs, so setting
JAX_COMPILATION_CACHE_DIR via os.environ in scripts is too late — jax has
already frozen its config defaults. Configure the cache through
jax.config here, where every entry point passes. Overridable via the same
env vars."""

import os as _os

try:
  import jax as _jax
  _jax.config.update(
      "jax_compilation_cache_dir",
      _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
  _jax.config.update(
      "jax_persistent_cache_min_compile_time_secs",
      float(_os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                            "2")))
except Exception:                                    # jax-less tooling
  pass
