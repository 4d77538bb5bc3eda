"""Isolated forward micro-benchmark for the full-spec LidarCenterNet.

The sensor-on wall is the model forward (optable_r4: 41% convolution
fusions at ~3 TF/s + 34% data-formatting copies). This times the forward
ALONE — no sim, no sensors — so normalization / conv-layout experiments
measure in minutes instead of a full bench run:

  python scripts/bench_forward.py --norm gn
  python scripts/bench_forward.py --norm bn_affine       # GN cost probe
  python scripts/bench_forward.py --norm gn --profile /tmp/fwd_trace

Reports ms/step and frames/s at the benchmark's B=16 bf16 operating point.
"""

from __future__ import annotations

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from carla_garage_tpu.models.transfuser import (LidarCenterNet,
                                                TransfuserConfig,
                                                micro_config)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--batch", type=int, default=16)
  ap.add_argument("--norm", default="gn", choices=["gn", "bn_affine"])
  ap.add_argument("--micro", action="store_true")
  ap.add_argument("--iters", type=int, default=30)
  ap.add_argument("--no-bf16", action="store_true")
  ap.add_argument("--profile", default=None,
                  help="write an XProf trace of the steady-state loop here")
  args = ap.parse_args()

  tcfg = micro_config() if args.micro else TransfuserConfig()
  model = LidarCenterNet(tcfg, norm=args.norm)
  B = args.batch
  rng = jax.random.key(0)
  rgb = jax.random.uniform(rng, (B, tcfg.img_h, tcfg.img_w, 3))
  lid = jax.random.uniform(rng, (B, tcfg.lidar_h, tcfg.lidar_w,
                                 tcfg.lidar_channels))
  tp = jnp.zeros((B, 2))
  cmd = jnp.zeros((B, 6)).at[:, 1].set(1.0)
  spd = jnp.zeros((B,))
  params = jax.jit(model.init)(rng, rgb, lid, tp, cmd, spd)
  n_params = sum(x.size for x in jax.tree.leaves(params))

  if args.no_bf16:
    cast = lambda t: t
  else:
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

  @jax.jit
  def fwd(p, rgb, lid, tp, cmd, spd):
    o = model.apply(cast(p), cast(rgb), cast(lid), cast(tp), cast(cmd),
                    cast(spd))
    # one scalar out: forces full execution, avoids a host transfer wall
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(o))

  t0 = time.time()
  out = fwd(params, rgb, lid, tp, cmd, spd)
  jax.block_until_ready(out)
  compile_s = time.time() - t0

  for _ in range(3):
    jax.block_until_ready(fwd(params, rgb, lid, tp, cmd, spd))
  if args.profile:
    with jax.profiler.trace(args.profile):
      for i in range(5):
        jax.block_until_ready(fwd(params, rgb + i * 1e-6, lid, tp, cmd, spd))
  # Block every iteration: the axon dispatch stream runs ahead of the
  # device, so an unsynchronized loop measures enqueue cost (~1 ms), not
  # execution (~100 ms). Per-iter block costs one host round-trip, which
  # is noise at this step size.
  # VARY the input every iteration: the axon proxy memoizes identical
  # (executable, args) calls — a repeated-args loop measured 0.63 ms/step
  # for a 120M-param model (>750 TF/s, past chip peak); perturbing one
  # operand restores the honest 25 ms.
  t0 = time.time()
  for i in range(args.iters):
    jax.block_until_ready(fwd(params, rgb + i * 1e-6, lid, tp, cmd, spd))
  dt = (time.time() - t0) / args.iters

  print(json.dumps({
      "norm": args.norm, "batch": B, "bf16": not args.no_bf16,
      "params_M": round(n_params / 1e6, 1),
      "compile_s": round(compile_s, 1),
      "ms_per_step": round(dt * 1e3, 2),
      "frames_per_s": round(B / dt, 1),
  }))


if __name__ == "__main__":
  main()
