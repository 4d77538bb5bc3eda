"""Driver-entry regression tests: single-chip compile + multi-chip dryrun."""

import jax

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
  fn, args = graft.entry()
  out = jax.jit(fn)(*args)
  jax.block_until_ready(out)
  assert out.ego.pos.shape[0] == 4


def test_dryrun_multichip():
  graft.dryrun_multichip(len(jax.devices()))
