"""Checkpoint save/restore — orbax-backed.

The reference saves per-epoch model_%04d.pth + optimizer/scaler/scheduler
and pickles the config next to the weights (train.py:967-995, :577-584);
inference merges the pickle over fresh defaults (sensor_agent.py:64-71).
Here: orbax for the param pytree + a JSON meta sidecar for the config.
"""

from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, params, meta: dict | None = None,
                    opt_state=None):
  path = os.path.abspath(path)
  ckptr = ocp.StandardCheckpointer()
  payload = {"params": params}
  if opt_state is not None:
    payload["opt_state"] = opt_state
  ckptr.save(os.path.join(path, "state"), payload, force=True)
  ckptr.wait_until_finished()
  if meta is not None:
    with open(os.path.join(path, "meta.json"), "w") as f:
      json.dump(meta, f, indent=1)


def load_checkpoint(path: str, template=None, meta_only: bool = False):
  """template: a pytree of matching structure (e.g. freshly-init params).
  meta_only=True reads just the meta.json sidecar (to recover the model
  config before the params template can be built)."""
  path = os.path.abspath(path)
  meta = None
  mp = os.path.join(path, "meta.json")
  if os.path.exists(mp):
    with open(mp) as f:
      meta = json.load(f)
  if meta_only:
    return None, meta
  ckptr = ocp.StandardCheckpointer()
  payload = ckptr.restore(os.path.join(path, "state"),
                          {"params": template})
  return payload["params"], meta
